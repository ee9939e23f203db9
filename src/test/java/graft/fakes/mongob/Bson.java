package graft.fakes.mongob;

public interface Bson {}
