package graft.tsdb

import graft.model.Matcher
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiles Prometheus-style label matchers to Catalyst predicates
  * (P3-P9 in SURVEY.md §2.2; reference `promMatchersToFrostDBExprs`,
  * hello.go:302-318).
  *
  * Semantics preserved exactly:
  *   - Absent label ⇔ NULL column ⇔ empty-string value (Prometheus
  *     convention; the reference drops null AND "" on decode,
  *     hello.go:339-349). So:
  *       `name=""`  matches rows where the label is absent;
  *       `name!=v` (v≠"") matches rows where the label is absent — SQL
  *       three-valued logic would silently drop NULL rows, so negative
  *       matchers are NULL-wrapped (SURVEY §7.6 risk item).
  *   - Regex matchers are UNANCHORED: the reference passes the raw
  *     pattern to FrostDB's RegexMatch (hello.go:310-311), which does a
  *     substring search — `rlike` has the same unanchored contract.
  *     (Prometheus-FACING surfaces — PromQL text, remote read — anchor
  *     their patterns BEFORE reaching this compiler, via
  *     [[PromQL.anchorMatchers]]; this layer is the engine API and
  *     keeps the reference's raw-pattern contract.)
  *   - `=~` does NOT match absent labels unless the pattern matches ""
  *     (we keep the engine behavior: NULL fails rlike, and `=~""`-style
  *     patterns that accept empty also accept NULL via the empty-equiv
  *     wrap below).
  *
  * All outputs are plain `Column` expressions — Catalyst folds them into
  * the scan (equality predicates push down to parquet row-group stats;
  * rlike evaluates post-scan, same placement as FrostDB's in-engine
  * regex). Zero custom expressions needed (SURVEY §4).
  */
object MatcherCompiler {
  import TsdbSchema.labelCol

  /** Predicate for one matcher over the wide table. */
  def compile(m: Matcher): Column = compileWith(m, labelCol(m.name))

  /** Dynamic-column semantics: a matcher over a label name that has
    * NEVER been observed (no physical column exists) behaves as an
    * all-NULL column — `name=""`/`name!=v` match everything, `name=v`
    * matches nothing — instead of failing resolution. Mirrors FrostDB,
    * where an unmaterialized dynamic column is simply absent from every
    * row. Pass the table's known label names to enable this. */
  def compile(m: Matcher, knownLabels: Set[String]): Column =
    if (knownLabels.contains(m.name)) compile(m)
    else compileWith(m, lit(null).cast("string"))

  private def compileWith(m: Matcher, c: Column): Column = {
    m match {
      case Matcher.Eq(_, "") => c.isNull || c === ""
      case Matcher.Eq(_, v)  => c === lit(v)
      case Matcher.NotEq(_, "") => c.isNotNull && c =!= ""
      case Matcher.NotEq(_, v)  => c.isNull || c =!= lit(v)
      case Matcher.Re(_, p) =>
        // NULL ≡ ""; a pattern that matches "" must also match absent.
        if (regexMatchesEmpty(p)) c.isNull || c.rlike(p) else c.rlike(p)
      case Matcher.NotRe(_, p) =>
        if (regexMatchesEmpty(p)) c.isNotNull && !c.rlike(p)
        else c.isNull || !c.rlike(p)
    }
  }

  /** Conjunction of all matchers (P7; variadic And at hello.go:317). */
  def compileAll(ms: Seq[Matcher]): Column =
    ms.map(compile).reduceOption(_ && _).getOrElse(lit(true))

  def compileAll(ms: Seq[Matcher], knownLabels: Set[String]): Column =
    ms.map(compile(_, knownLabels)).reduceOption(_ && _).getOrElse(lit(true))

  /** Time-range predicate — STRICTLY exclusive on both ends, exactly as
    * the reference builds it (hello.go:521-523). */
  def timeRange(start: Long, end: Long): Column =
    col(TsdbSchema.TimeCol) > lit(start) && col(TsdbSchema.TimeCol) < lit(end)

  /** Whether an (unanchored) pattern matches the empty string — decides
    * absent-label handling for regex matchers. Unanchored search over ""
    * succeeds iff the pattern can match at the single empty position. */
  private[tsdb] def regexMatchesEmpty(p: String): Boolean =
    try java.util.regex.Pattern.compile(p).matcher("").find()
    catch { case _: Exception => false }
}
