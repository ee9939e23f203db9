package graft.fakes.mongoa;

public interface MongoClient {
  MongoDatabase getDatabase(String name);
  void close();
}
