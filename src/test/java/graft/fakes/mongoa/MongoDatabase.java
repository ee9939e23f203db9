package graft.fakes.mongoa;

public interface MongoDatabase {
  MongoCollection getCollection(String name);
}
