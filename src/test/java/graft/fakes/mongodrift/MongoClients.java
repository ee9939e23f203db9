package graft.fakes.mongodrift;

/**
 * DRIFTED copy of the Mongo driver entry point (VERDICT r17 task #8):
 * the static factory is renamed {@code newClient} — a simulated vendor
 * signature change. RealNameBindingSpec's negative arm binds the
 * production {@code MongoReflectionSink} against this class and
 * asserts {@code connect()} fails loudly at
 * {@code getMethod("create", String)}; a pass here would mean the
 * real-FQN fakes no longer falsify anything.
 */
public final class MongoClients {
  private MongoClients() {}

  /** What `create(String)` drifted into. */
  public static Object newClient(String uri) {
    return new Object();
  }
}
