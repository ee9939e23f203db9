package com.mongodb.client;

import java.util.concurrent.ConcurrentHashMap;
import java.util.Map;

import org.bson.Document;
import org.bson.conversions.Bson;
import com.mongodb.client.model.Filters;
import com.mongodb.client.model.ReplaceOptions;

/** REAL-NAME embedded fake (test scope only) — see EmbeddedMongo. */
public final class MongoClients {
  public static MongoClient create(String connectionString) {
    return new ClientImpl(connectionString);
  }

  // package-private impls: the real driver's layout — reflective method
  // lookup MUST go through the public interface Class or it throws
  // IllegalAccessException (the property MongoReflectionSink codes for)
  static final class ClientImpl implements MongoClient {
    final String uri;
    ClientImpl(String uri) { this.uri = uri; }
    @Override public MongoDatabase getDatabase(String name) { return new DbImpl(name); }
    @Override public void close() {}
  }

  static final class DbImpl implements MongoDatabase {
    final String db;
    DbImpl(String db) { this.db = db; }
    @Override public MongoCollection getCollection(String name) {
      return new CollImpl(db, name);
    }
  }

  static final class CollImpl implements MongoCollection {
    final String db; final String coll;
    CollImpl(String db, String coll) { this.db = db; this.coll = coll; }
    @Override public Object replaceOne(Bson filter, Object replacement,
        ReplaceOptions options) {
      EmbeddedMongo.replaceCalls.incrementAndGet();
      Filters.EqFilter eq = (Filters.EqFilter) filter;
      Document doc = (Document) replacement;
      Map<Object, Document> c = EmbeddedMongo.collection(db, coll);
      if (!options.isUpsert()) {
        EmbeddedMongo.nonUpsertCalls.incrementAndGet();
        if (!c.containsKey(eq.value)) return "UpdateResult(matched=0)";
      }
      c.put(eq.value, doc);
      return "UpdateResult(upserted)";
    }
  }

  private MongoClients() {}
}
