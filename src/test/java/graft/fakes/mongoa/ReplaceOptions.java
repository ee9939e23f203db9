package graft.fakes.mongoa;

public class ReplaceOptions {
  public boolean upserted = false;
  public ReplaceOptions upsert(boolean u) { upserted = u; return this; } // fluent
}
