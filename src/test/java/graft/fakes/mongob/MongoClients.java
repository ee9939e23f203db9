package graft.fakes.mongob;

/**
 * Scripted fake of a VARIANT driver API shape for the spec matrix:
 * void-returning replaceOne, void (non-fluent) ReplaceOptions.upsert,
 * and NO close() on the client interface — the binding must invoke
 * through what exists and tolerate what doesn't.
 */
public final class MongoClients {
  public static MongoClient create(String uri) {
    Recorder.calls.add("create:" + uri);
    return new ClientImpl();
  }
}
