package graft.fakes.miloa;

/** Shape-A TimestampsToReturn: static valueOf(String), enum-like. */
public class TimestampsToReturn {
  public final String name;
  private TimestampsToReturn(String name) { this.name = name; }
  public static TimestampsToReturn valueOf(String n) { return new TimestampsToReturn(n); }
}
