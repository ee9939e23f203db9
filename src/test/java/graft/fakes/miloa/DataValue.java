package graft.fakes.miloa;

/** Shape-A DataValue: value/status/source+server DateTime accessors. */
public class DataValue {
  private final Object raw; private final long status;
  private final DateTime src; private final DateTime srv;
  public DataValue(Object raw, long status, DateTime src, DateTime srv) {
    this.raw = raw; this.status = status; this.src = src; this.srv = srv;
  }
  public Variant getValue() { return new Variant(raw); }
  public StatusCode getStatusCode() { return new StatusCode(status); }
  public DateTime getSourceTime() { return src; }
  public DateTime getServerTime() { return srv; }
}
