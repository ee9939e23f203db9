package graft.fakes.mongoa;

/**
 * Scripted fake of the MongoDB sync driver's 4.x-era API SHAPE: public
 * interfaces, PACKAGE-PRIVATE implementation classes (method lookup must
 * go through the interface Class or invocation throws
 * IllegalAccessException — exactly the real driver's layout), fluent
 * ReplaceOptions, UpdateResult-like object returned from replaceOne,
 * and a present close().
 */
public final class MongoClients {
  public static MongoClient create(String uri) {
    Recorder.calls.add("create:" + uri);
    return new ClientImpl();
  }
}
