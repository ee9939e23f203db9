package graft.fakes.miloa;

import java.util.ArrayList;
import java.util.List;
import java.util.concurrent.CompletableFuture;

/**
 * Scripted fake of Eclipse Milo's 0.6-era client API SHAPE, for the
 * MiloReflectionSession spec matrix (VERDICT r12 item 6): static
 * {@code create(String)}, {@code connect()} returning a
 * {@code CompletableFuture} of the connected client, async
 * {@code readValue(double, TimestampsToReturn, NodeId)}, and a present
 * {@code disconnect()}. The reflection binding never names this class —
 * the spec's loadClass override maps the Milo class names here.
 */
public class OpcUaClient {
  public static final List<String> calls = new ArrayList<>();
  /** 1601-epoch ticks for 1s / 2s past the Unix epoch (100 ns units). */
  public static final long UNIX_EPOCH_TICKS = 116444736000000000L;

  public final String url;

  public OpcUaClient(String url) { this.url = url; }

  public static OpcUaClient create(String url) {
    calls.add("create:" + url);
    return new OpcUaClient(url);
  }

  public CompletableFuture<OpcUaClient> connect() {
    calls.add("connect");
    return CompletableFuture.completedFuture(this);
  }

  public CompletableFuture<DataValue> readValue(
      double maxAge, TimestampsToReturn tsr, NodeId node) {
    calls.add("read:" + node.id + ":" + tsr.name + ":" + maxAge);
    return CompletableFuture.completedFuture(new DataValue(
        "42.5", 0L,
        new DateTime(UNIX_EPOCH_TICKS + 10_000_000L),   // 1s → 1_000_000 µs
        new DateTime(UNIX_EPOCH_TICKS + 20_000_000L))); // 2s → 2_000_000 µs
  }

  public void disconnect() { calls.add("disconnect"); }
}
