package graft.fakes.miloa;

public class Variant {
  private final Object v;
  public Variant(Object v) { this.v = v; }
  public Object getValue() { return v; }
}
