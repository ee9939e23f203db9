package org.eclipse.milo.opcua.stack.core.types.builtin;

/** REAL-NAME embedded fake (test scope only) — see DateTime.java. */
public final class NodeId {
  public final String id;
  private NodeId(String id) { this.id = id; }
  public static NodeId parse(String s) { return new NodeId(s); }
}
