package com.mongodb.client.model;

/** REAL-NAME embedded fake (test scope only) — see EmbeddedMongo. */
public class ReplaceOptions {
  private boolean upsert = false;
  public ReplaceOptions upsert(boolean upsert) { this.upsert = upsert; return this; }
  public boolean isUpsert() { return upsert; }
}
