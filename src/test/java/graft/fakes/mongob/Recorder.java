package graft.fakes.mongob;

import java.util.ArrayList;
import java.util.List;

public final class Recorder {
  public static final List<String> calls = new ArrayList<>();
  public static EqBson lastFilter;
  public static Document lastDoc;
  public static ReplaceOptions lastOpts;
  public static void reset() { calls.clear(); lastFilter = null; lastDoc = null; lastOpts = null; }
}
