package graft.fakes.milob;

public class StatusCode {
  private final long v;
  public StatusCode(long v) { this.v = v; }
  public long getValue() { return v; }
}
