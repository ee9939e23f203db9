package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt evaluation (RFC 9309 subset) — the crawl-permission gate
  * between [[Urls]] and fetch scheduling, completing the native crawl
  * chain (WARC → HTML → URL → ROBOTS → quality → rank). No reference
  * analog (SURVEY.md §2.11 crawl surface).
  *
  * Subset implemented (documented, spec-pinned):
  *   - groups: consecutive `User-agent:` lines share the rule block
  *     that follows; group selection is EXACT agent-token match when
  *     one exists, else the `*` group, else everything is allowed
  *     (RFC 9309 §2.2.1 without the longest-substring UA refinement);
  *   - rules: `Allow:` / `Disallow:` LITERAL path prefixes (no `*`/`$`
  *     wildcards); field names case-insensitive, values trimmed;
  *   - decision: longest matching prefix wins; at equal length Allow
  *     wins (RFC 9309 §2.2.2); no matching rule or an empty-value
  *     `Disallow:` line → allowed; unknown lines and comments ignored.
  *
  * Spark shape: robots bodies explode into (host, agent, rule, prefix)
  * rows ONCE (narrow per-host parse, rule count bounded per host), the
  * group choice is a per-host aggregate, and the URL × rule decision is
  * an equi-join on host followed by a bounded per-(url, rule) prefix
  * test and one window cut — no cross product, no UDFs on the URL side,
  * and the whole decision replays in SQL (q238's oracle).
  */
object Robots {

  /** `(hostCol, txtCol)` → one rule row per (host, agent, idx):
    * `rule` ∈ {allow, disallow}, `prefix` = literal path prefix.
    * Empty-value Disallow lines emit NO row (they mean allow-all);
    * empty-value Allow lines are meaningless and dropped too.
    */
  def rules(robots: DataFrame, hostCol: String, txtCol: String): DataFrame = {
    // line idx keeps group attribution deterministic
    val lines = robots.select(col(hostCol).as("host"),
        posexplode(split(col(txtCol), "\n")).as(Seq("idx", "line")))
      .withColumn("line", regexp_replace(col("line"), "#.*$", ""))
      .withColumn("field", lower(trim(regexp_extract(col("line"), "^([^:]+):", 1))))
      .withColumn("value", trim(regexp_extract(col("line"), "^[^:]+:(.*)$", 1)))
      .filter(col("field").isin("user-agent", "allow", "disallow"))
    // group id = running count of user-agent lines that START a new
    // group (a UA line directly after another UA line joins its group)
    val w = Window.partitionBy("host").orderBy("idx")
    val grouped = lines
      .withColumn("isUa", (col("field") === "user-agent").cast("int"))
      .withColumn("prevUa", lag(col("isUa"), 1, 0).over(w))
      .withColumn("newGroup",
        ((col("isUa") === 1) && (col("prevUa") === 0)).cast("int"))
      .withColumn("gid", sum(col("newGroup")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val agents = grouped.filter(col("field") === "user-agent")
      .select(col("host"), col("gid"), lower(col("value")).as("agent"))
    val ruleRows = grouped
      .filter(col("field").isin("allow", "disallow") && col("value") =!= "")
      .select(col("host"), col("gid"), col("idx"),
        col("field").as("rule"), col("value").as("prefix"))
    agents.join(ruleRows, Seq("host", "gid"))
      .select(col("host"), col("agent"), col("idx"), col("rule"), col("prefix"))
  }

  /** Decide `(urlCol)` fetchability for `agent` against per-host robots
    * bodies: returns the input URL frame plus an `allowed` boolean.
    * URLs whose host has no robots row are allowed (no robots file =
    * no restrictions, RFC 9309 §2.3.1.2).
    */
  def allowed(urls: DataFrame, urlCol: String,
      robots: DataFrame, hostCol: String, txtCol: String,
      agent: String): DataFrame = {
    val agentLc = agent.toLowerCase
    val r = rules(robots, hostCol, txtCol)
    // group choice per host: the exact-agent group when present, else *
    val hostsWithExact = r.filter(col("agent") === agentLc)
      .select("host").distinct().withColumn("__exact", lit(true))
    val chosen = r.join(hostsWithExact, Seq("host"), "left")
      .filter(when(col("__exact"), col("agent") === agentLc)
        .otherwise(col("agent") === "*"))
      .select(col("host"), col("rule"), col("prefix"))
    val u = urls.withColumn("__rowid", monotonically_increasing_id())
      .withColumn("__host", Urls.host(col(urlCol)))
      .withColumn("__path",
        regexp_extract(col(urlCol), "^[^/?]*//[^/?]*(/[^?]*)?", 1))
      .withColumn("__path", when(col("__path") === "", "/").otherwise(col("__path")))
    // equi-join on host; keep rules whose prefix matches; longest wins,
    // Allow wins ties (rule asc: 'allow' < 'disallow' lexicographically)
    val chosenR = chosen.withColumnRenamed("host", "__rhost")
    val matched = u.join(chosenR, col("__host") === col("__rhost"), "left")
      .withColumn("__hit",
        col("prefix").isNotNull &&
          col("__path").substr(lit(1), length(col("prefix"))) === col("prefix"))
    val dw = Window.partitionBy(col("__rowid"))
      .orderBy(col("__hit").desc, length(col("prefix")).desc, col("rule").asc)
    matched
      .withColumn("__rn", row_number().over(dw))
      .filter(col("__rn") === 1)
      .withColumn("allowed",
        when(!col("__hit") || col("__hit").isNull, lit(true))
          .otherwise(col("rule") === "allow"))
      .drop("__rhost", "rule", "prefix", "__hit", "__rn", "__host", "__path", "__rowid")
  }
}
