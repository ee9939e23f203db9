package graft.fakes.mongoa;

import java.util.ArrayList;
import java.util.List;

/** Per-shape call log for the MongoReflectionSink spec matrix. */
public final class Recorder {
  public static final List<String> calls = new ArrayList<>();
  public static EqBson lastFilter;
  public static Document lastDoc;
  public static ReplaceOptions lastOpts;
  public static void reset() { calls.clear(); lastFilter = null; lastDoc = null; lastOpts = null; }
}
