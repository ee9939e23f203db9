package org.eclipse.milo.opcua.stack.core.types.builtin;

/** REAL-NAME embedded fake (test scope only) — see DateTime.java. */
public final class StatusCode {
  private final long value;
  public StatusCode(long value) { this.value = value; }
  public long getValue() { return value; }
}
