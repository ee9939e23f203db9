package graft.fakes.mongob;

public interface MongoCollection {
  void replaceOne(Bson filter, Object doc, ReplaceOptions opts); // void shape
}
