package com.mongodb.client;

import java.util.Map;
import java.util.concurrent.ConcurrentHashMap;
import java.util.concurrent.atomic.AtomicLong;

import org.bson.Document;

/**
 * REAL-NAME embedded document store (test scope only): the MongoDB
 * sync driver's public API layout — static MongoClients.create, public
 * INTERFACES over package-private impls (the 4.x property that forces
 * interface-class method lookup), fluent ReplaceOptions — under the
 * real FQNs, backed by an in-process (database, collection, key) ->
 * Document map, so graft's production MongoReflectionSink binds and
 * writes through its unmodified Class.forName path. The closest
 * offline analogue to a real-driver run (VERDICT r16 task #5: zero
 * egress, no driver artifact in any cache). Remove these fakes if
 * mongodb-driver-sync is ever added to the TEST classpath.
 */
public final class EmbeddedMongo {
  /** database -> collection -> keyValue -> document */
  public static final Map<String, Map<String, Map<Object, Document>>> DBS =
      new ConcurrentHashMap<>();
  public static final AtomicLong replaceCalls = new AtomicLong();
  public static final AtomicLong nonUpsertCalls = new AtomicLong();
  public static void reset() { DBS.clear(); replaceCalls.set(0); nonUpsertCalls.set(0); }

  public static Map<Object, Document> collection(String db, String coll) {
    return DBS
        .computeIfAbsent(db, d -> new ConcurrentHashMap<>())
        .computeIfAbsent(coll, c -> new ConcurrentHashMap<>());
  }
}
