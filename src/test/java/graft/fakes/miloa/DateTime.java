package graft.fakes.miloa;

/** UA DateTime: 100 ns ticks since 1601-01-01 UTC. */
public class DateTime {
  private final long ticks;
  public DateTime(long ticks) { this.ticks = ticks; }
  public long getUtcTime() { return ticks; }
}
