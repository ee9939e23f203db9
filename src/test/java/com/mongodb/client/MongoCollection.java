package com.mongodb.client;

import org.bson.conversions.Bson;
import com.mongodb.client.model.ReplaceOptions;

/** REAL-NAME embedded fake (test scope only) — see EmbeddedMongo. */
public interface MongoCollection {
  Object replaceOne(Bson filter, Object replacement, ReplaceOptions options);
}
