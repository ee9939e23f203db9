package graft.fakes.mongob;

class ClientImpl implements MongoClient {
  @Override public MongoDatabase getDatabase(String name) {
    Recorder.calls.add("getDatabase:" + name);
    return new DbImpl();
  }
}

class DbImpl implements MongoDatabase {
  @Override public MongoCollection getCollection(String name) {
    Recorder.calls.add("getCollection:" + name);
    return new CollImpl();
  }
}

class CollImpl implements MongoCollection {
  @Override public void replaceOne(Bson filter, Object doc, ReplaceOptions opts) {
    Recorder.calls.add("replaceOne");
    Recorder.lastFilter = (EqBson) filter;
    Recorder.lastDoc = (Document) doc;
    Recorder.lastOpts = opts;
  }
}
