package graft.fakes.milob;

import java.util.ArrayList;
import java.util.List;
import java.util.concurrent.CompletableFuture;

/**
 * Scripted fake of a NEWER (1.x-style) Milo client API SHAPE for the
 * spec matrix: {@code connect()} returns the client SYNCHRONOUSLY (no
 * future), {@code disconnect()} does not exist (close() must tolerate
 * NoSuchMethodException), the read's source DateTime is null (absent
 * timestamp → 0 µs, not an NPE), the Variant's raw value is null
 * (→ empty text), and the status code carries the Bad severity bits.
 */
public class OpcUaClient {
  public static final List<String> calls = new ArrayList<>();

  public final String url;

  public OpcUaClient(String url) { this.url = url; }

  public static OpcUaClient create(String url) {
    calls.add("create:" + url);
    return new OpcUaClient(url);
  }

  public OpcUaClient connect() {  // sync shape: returns this directly
    calls.add("connect");
    return this;
  }

  public CompletableFuture<DataValue> readValue(
      double maxAge, TimestampsToReturn tsr, NodeId node) {
    calls.add("read:" + node.id);
    return CompletableFuture.completedFuture(new DataValue(
        null, 0x80000000L, null,
        new DateTime(116444736000000000L + 30_000_000L))); // 3s → 3_000_000 µs
  }
  // no disconnect(): close() must swallow the NoSuchMethodException
}
