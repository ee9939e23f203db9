package org.bson.conversions;

/** REAL-NAME embedded fake (test scope only) — see org.bson.Document. */
public interface Bson {}
