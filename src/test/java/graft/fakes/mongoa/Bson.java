package graft.fakes.mongoa;

public interface Bson {}
