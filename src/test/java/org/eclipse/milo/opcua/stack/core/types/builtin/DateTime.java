package org.eclipse.milo.opcua.stack.core.types.builtin;

/**
 * REAL-NAME embedded fake (test scope only): carries Eclipse Milo's
 * public FQN so graft's production reflection binding
 * (MiloReflectionSession, plain Class.forName) resolves it with no
 * override — the closest offline analogue to a real-jar integration
 * run (VERDICT r16 task #5; this sandbox has zero egress and no Milo
 * artifact in any cache). Remove these fakes if milo-sdk-client is
 * ever added to the TEST classpath.
 */
public final class DateTime {
  private final long utcTicks; // 100ns ticks since 1601-01-01
  public DateTime(long utcTicks) { this.utcTicks = utcTicks; }
  public long getUtcTime() { return utcTicks; }
}
