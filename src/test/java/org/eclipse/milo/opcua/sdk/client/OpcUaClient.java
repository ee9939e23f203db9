package org.eclipse.milo.opcua.sdk.client;

import java.util.ArrayList;
import java.util.Collections;
import java.util.List;
import java.util.Map;
import java.util.concurrent.CompletableFuture;
import java.util.concurrent.ConcurrentHashMap;

import org.eclipse.milo.opcua.stack.core.types.builtin.DataValue;
import org.eclipse.milo.opcua.stack.core.types.builtin.DateTime;
import org.eclipse.milo.opcua.stack.core.types.builtin.NodeId;
import org.eclipse.milo.opcua.stack.core.types.builtin.StatusCode;
import org.eclipse.milo.opcua.stack.core.types.builtin.Variant;
import org.eclipse.milo.opcua.stack.core.types.enumerated.TimestampsToReturn;

/**
 * REAL-NAME embedded OPC UA "server" (test scope only): the exact
 * public API shape graft's MiloReflectionSession binds — static
 * {@code create(String)}, future-returning {@code connect()}, async
 * {@code readValue(double, TimestampsToReturn, NodeId)},
 * {@code disconnect()} — under Eclipse Milo's real FQN, backed by a
 * scriptable in-process tag table. The production binding resolves it
 * through its unmodified Class.forName path, so the spec exercises
 * real classloading, static-method lookup, boxing, and future
 * unwrapping end to end without the (unavailable, zero-egress) vendor
 * jars. Remove if milo-sdk-client is ever added to the TEST classpath.
 */
public final class OpcUaClient {
  /** nodeId -> [text, statusCode(Long), srcMicros(Long), svrMicros(Long)] */
  private static final Map<String, Object[]> SERVER = new ConcurrentHashMap<>();
  public static final List<String> CALLS =
      Collections.synchronizedList(new ArrayList<>());
  /** 1601-epoch offset of the Unix epoch, in 100ns ticks. */
  public static final long UNIX_EPOCH_TICKS = 116444736000000000L;
  /** Bad_NodeIdUnknown (severity bits = Bad). */
  public static final long BAD_NODE_ID_UNKNOWN = 0x80340000L;

  public static void serve(String nodeId, String text, long statusCode,
      long srcMicros, long svrMicros) {
    SERVER.put(nodeId, new Object[]{text, statusCode, srcMicros, svrMicros});
  }
  public static void reset() { SERVER.clear(); CALLS.clear(); }

  private final String url;
  private volatile boolean connected = false;
  private OpcUaClient(String url) { this.url = url; }

  public static OpcUaClient create(String url) {
    CALLS.add("create:" + url);
    return new OpcUaClient(url);
  }

  public CompletableFuture<OpcUaClient> connect() {
    connected = true;
    CALLS.add("connect:" + url);
    return CompletableFuture.completedFuture(this);
  }

  public CompletableFuture<DataValue> readValue(
      double maxAge, TimestampsToReturn tsr, NodeId node) {
    CALLS.add("read:" + node.id);
    if (!connected) {
      CompletableFuture<DataValue> f = new CompletableFuture<>();
      f.completeExceptionally(new IllegalStateException("session not connected"));
      return f;
    }
    Object[] rec = SERVER.get(node.id);
    if (rec == null) {
      // unknown node: Bad status, null value/timestamps — the shape a
      // real server answers with, which the binding must survive
      return CompletableFuture.completedFuture(new DataValue(
          new Variant(null), new StatusCode(BAD_NODE_ID_UNKNOWN), null, null));
    }
    long src = (Long) rec[2], svr = (Long) rec[3];
    return CompletableFuture.completedFuture(new DataValue(
        new Variant(rec[0]), new StatusCode((Long) rec[1]),
        new DateTime(UNIX_EPOCH_TICKS + src * 10L),
        new DateTime(UNIX_EPOCH_TICKS + svr * 10L)));
  }

  public void disconnect() {
    connected = false;
    CALLS.add("disconnect:" + url);
  }
}
