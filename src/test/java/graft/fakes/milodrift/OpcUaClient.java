package graft.fakes.milodrift;

import java.util.concurrent.CompletableFuture;

/**
 * DRIFTED copy of the Milo client shape (VERDICT r17 task #8): the
 * static factory is renamed {@code newClient} — the kind of silent
 * vendor signature change the real-FQN binding specs must CATCH, not
 * absorb. The negative arm in RealNameBindingSpec resolves the binding
 * against this class and asserts the production reflection lookup
 * fails loudly at {@code getMethod("create", String)}; if that arm
 * ever passes without throwing, the fakes have stopped pinning the
 * vendor contract and prove nothing.
 */
public class OpcUaClient {
  public final String url;

  public OpcUaClient(String url) { this.url = url; }

  /** What `create(String)` drifted into. */
  public static OpcUaClient newClient(String url) {
    return new OpcUaClient(url);
  }

  public CompletableFuture<OpcUaClient> connect() {
    return CompletableFuture.completedFuture(this);
  }

  public void disconnect() {}
}
