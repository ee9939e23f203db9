package graft.fakes.mongoa;

public class EqBson implements Bson {
  public final String field; public final Object value;
  public EqBson(String field, Object value) { this.field = field; this.value = value; }
}
