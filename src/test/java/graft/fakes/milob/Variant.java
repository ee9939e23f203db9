package graft.fakes.milob;

public class Variant {
  private final Object v;
  public Variant(Object v) { this.v = v; }
  public Object getValue() { return v; }
}
