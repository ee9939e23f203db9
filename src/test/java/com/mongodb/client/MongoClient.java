package com.mongodb.client;

/** REAL-NAME embedded fake (test scope only) — see EmbeddedMongo. */
public interface MongoClient {
  MongoDatabase getDatabase(String name);
  void close();
}
