package graft.fakes.mongob;

public interface MongoClient {
  MongoDatabase getDatabase(String name);
  // no close(): the binding's close() must swallow NoSuchMethodException
}
