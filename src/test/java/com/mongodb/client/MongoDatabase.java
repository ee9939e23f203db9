package com.mongodb.client;

/** REAL-NAME embedded fake (test scope only) — see EmbeddedMongo. */
public interface MongoDatabase {
  MongoCollection getCollection(String name);
}
