package graft.fakes.mongoa;

public interface MongoCollection {
  Object replaceOne(Bson filter, Object doc, ReplaceOptions opts);
}
