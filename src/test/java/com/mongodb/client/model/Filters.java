package com.mongodb.client.model;

import org.bson.conversions.Bson;

/** REAL-NAME embedded fake (test scope only) — see EmbeddedMongo. */
public final class Filters {
  public static final class EqFilter implements Bson {
    public final String field; public final Object value;
    EqFilter(String field, Object value) { this.field = field; this.value = value; }
  }
  public static Bson eq(String fieldName, Object value) {
    return new EqFilter(fieldName, value);
  }
}
