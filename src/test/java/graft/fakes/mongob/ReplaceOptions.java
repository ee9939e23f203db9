package graft.fakes.mongob;

public class ReplaceOptions {
  public boolean upserted = false;
  public void upsert(boolean u) { upserted = u; } // void, non-fluent shape
}
