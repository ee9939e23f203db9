package org.eclipse.milo.opcua.stack.core.types.builtin;

/** REAL-NAME embedded fake (test scope only) — see DateTime.java. */
public final class Variant {
  private final Object value;
  public Variant(Object value) { this.value = value; }
  public Object getValue() { return value; }
}
