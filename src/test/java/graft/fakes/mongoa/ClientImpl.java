package graft.fakes.mongoa;

class ClientImpl implements MongoClient {  // package-private, like the driver
  @Override public MongoDatabase getDatabase(String name) {
    Recorder.calls.add("getDatabase:" + name);
    return new DbImpl();
  }
  @Override public void close() { Recorder.calls.add("close"); }
}

class DbImpl implements MongoDatabase {
  @Override public MongoCollection getCollection(String name) {
    Recorder.calls.add("getCollection:" + name);
    return new CollImpl();
  }
}

class CollImpl implements MongoCollection {
  @Override public Object replaceOne(Bson filter, Object doc, ReplaceOptions opts) {
    Recorder.calls.add("replaceOne");
    Recorder.lastFilter = (EqBson) filter;
    Recorder.lastDoc = (Document) doc;
    Recorder.lastOpts = opts;
    return new Object(); // UpdateResult-like, ignored by the binding
  }
}
