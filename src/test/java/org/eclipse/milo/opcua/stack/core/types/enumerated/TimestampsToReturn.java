package org.eclipse.milo.opcua.stack.core.types.enumerated;

/** REAL-NAME embedded fake (test scope only) — see builtin/DateTime.java. */
public enum TimestampsToReturn { Source, Server, Both, Neither }
