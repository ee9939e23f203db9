package graft.fakes.miloc;

/**
 * Scripted NEGATIVE shape: a hypothetical Milo whose {@code connect()}
 * reflects to null (void-like) — the binding must fail AT the version
 * mismatch with its "unexpected connect() return shape" error, not
 * surface later as a misleading "readValue before connect()".
 */
public class OpcUaClient {
  public OpcUaClient(String url) {}
  public static OpcUaClient create(String url) { return new OpcUaClient(url); }
  public Object connect() { return null; }
}
