package graft.fakes.mongob;

import java.util.LinkedHashMap;

public class Document {
  public final LinkedHashMap<String, Object> fields = new LinkedHashMap<>();
  public Document() {}
  public Document append(String k, Object v) { fields.put(k, v); return this; }
}
