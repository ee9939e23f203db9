package graft.fakes.mongob;

public final class Filters {
  public static Bson eq(String field, Object value) { return new EqBson(field, value); }
}
