package graft.fakes.miloa;

/** Shape-A NodeId: static parse, as the reflection binding expects. */
public class NodeId {
  public final String id;
  public NodeId(String id) { this.id = id; }
  public static NodeId parse(String s) { return new NodeId(s); }
}
