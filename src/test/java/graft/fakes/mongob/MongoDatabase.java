package graft.fakes.mongob;

public interface MongoDatabase {
  MongoCollection getCollection(String name);
}
