package org.eclipse.milo.opcua.stack.core.types.builtin;

/** REAL-NAME embedded fake (test scope only) — see DateTime.java. */
public final class DataValue {
  private final Variant value;
  private final StatusCode statusCode;
  private final DateTime sourceTime;
  private final DateTime serverTime;
  public DataValue(Variant value, StatusCode statusCode,
      DateTime sourceTime, DateTime serverTime) {
    this.value = value; this.statusCode = statusCode;
    this.sourceTime = sourceTime; this.serverTime = serverTime;
  }
  public Variant getValue() { return value; }
  public StatusCode getStatusCode() { return statusCode; }
  public DateTime getSourceTime() { return sourceTime; }
  public DateTime getServerTime() { return serverTime; }
}
