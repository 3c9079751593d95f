package graft.model

/** Core data model of the engine, mirroring the reference's fundamental
  * abstractions (see SURVEY.md §1.1; reference `hello.go:29-48`):
  *
  *   - [[Sample]] ≡ `Data{Value float64; Time int64; LABEL Labels}`
  *     (hello.go:29-33) — one time-series sample in "long"/ingest form,
  *     with the label set carried as a map because label names are not
  *     known up front.
  *   - [[Series]] ≡ `series{l labels.Labels; ts []int64; v []float64}`
  *     (hello.go:40-44) — a unique label set plus parallel time/value
  *     arrays sorted by time.
  *   - [[Matcher]] ≡ the four Prometheus label-matcher kinds the
  *     reference compiles to engine predicates (hello.go:302-318).
  */
final case class Sample(time: Long, value: Double, labels: Map[String, String])

final case class Series(labels: Map[String, String], ts: Seq[Long], v: Seq[Double])

/** Prometheus-style label matcher ADT (reference `hello.go:302-318`,
  * `README.md:124-141`). `name` is the label name WITHOUT the storage
  * prefix; the compiler addresses the wide column `labels.<name>`.
  */
sealed trait Matcher {
  def name: String
}
object Matcher {
  /** `name = value` (labels.MatchEqual → Col.Eq, hello.go:306-307). */
  final case class Eq(name: String, value: String) extends Matcher
  /** `name != value` (labels.MatchNotEqual → Col.NotEq, hello.go:308-309). */
  final case class NotEq(name: String, value: String) extends Matcher
  /** `name =~ pattern` — UNANCHORED regex, matching the reference which
    * hands the raw pattern to the engine (hello.go:310-311). */
  final case class Re(name: String, pattern: String) extends Matcher
  /** `name !~ pattern` (hello.go:312-313). */
  final case class NotRe(name: String, pattern: String) extends Matcher
}
