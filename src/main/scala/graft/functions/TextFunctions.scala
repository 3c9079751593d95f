package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, shingling, quality scoring, language-ID heuristic,
  * order-sensitive document fingerprinting. All pure built-in expressions
  * (codegen'd, no UDFs) so they vectorize over a 100 TB documents table
  * and are reproducible in the DuckDB oracle.
  */
object TextFunctions {
  import Hashing._

  /** Whitespace tokens. Single-space split (limit -1 semantics: empty
    * tokens from runs of spaces are KEPT, matching DuckDB string_split). */
  def tokens(text: Column): Column = split(text, " ", -1)

  /** Canonical cleanup before dedup/fingerprinting: lowercase, strip
    * non-alphanumerics, collapse whitespace runs, trim. Pure codegen'd
    * string expressions (regexp_replace), map-side only. */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word chunks + digits + punctuation as separate
    * tokens — a cheap stand-in for a real tokenizer's token count. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]{1,6}|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Word k-shingles (k consecutive tokens joined by a space) — the
    * MinHash input unit. Documents shorter than k tokens get the whole
    * text as their single shingle.
    *
    * PERF: the token array must never be referenced INSIDE a lambda —
    * a lambda body re-evaluates captured expressions per ELEMENT, which
    * turns one tokenize/row into O(tokens²)/row. Instead the k shifted
    * views are zipped row-level (`arrays_zip` of `slice`s) and the lambda
    * touches only its own struct argument. */
  def shingles(text: Column, k: Int): Column = {
    val t = tokens(text)
    val zipped = arrays_zip((0 until k).map(o =>
      slice(t, lit(o + 1), greatest(size(t) - k + 1, lit(0))).as(s"w$o")): _*)
    when(size(t) < k, array(text)).otherwise(
      transform(zipped, s => concat_ws(" ", (0 until k).map(o => s.getField(s"w$o")): _*)))
  }

  /** Heuristic quality score in [0,1]: balances length, punctuation
    * density, mean word length and stopword presence — the standard cheap
    * pre-filters applied before LLM training. */
  def qualityScore(text: Column, nChars: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val stop = regexp_count(text, lit("\\b(the|a|and|of|to)\\b")).cast("double")
    val punct = regexp_count(text, lit("[^A-Za-z0-9 ]")).cast("double")
    val meanWord = nChars.cast("double") / greatest(nTok, lit(1.0))
    val lenScore = least(nTok / lit(64.0), lit(1.0))
    val stopScore = least(stop / greatest(nTok, lit(1.0)) * lit(10.0), lit(1.0))
    val punctPenalty = least(punct / greatest(nChars.cast("double"), lit(1.0)) * lit(5.0), lit(1.0))
    val wordScore = when(meanWord >= 3 && meanWord <= 10, lit(1.0)).otherwise(lit(0.5))
    round(lit(0.4) * lenScore + lit(0.3) * stopScore +
      lit(0.2) * wordScore + lit(0.1) * (lit(1.0) - punctPenalty), 6)
  }

  /** N-gram-flavored language-ID heuristic: score a few character
    * bigram/stopword signals per language, take the argmax (deterministic
    * tie-break by score order below). Real pipelines plug fastText here;
    * the Spark-side shape (scores → argmax, columnar, no shuffle) is what
    * scales. */
  def langScores(text: Column): Map[String, Column] = Map(
    "en" -> regexp_count(text, lit("\\b(the|and|of|is|to)\\b")),
    "de" -> (regexp_count(text, lit("\\b(der|die|das|und|ist)\\b")) + regexp_count(text, lit("sch|ein"))),
    "es" -> (regexp_count(text, lit("\\b(el|la|los|que|es)\\b")) + regexp_count(text, lit("ción|ado"))),
    "fr" -> (regexp_count(text, lit("\\b(le|la|les|est|une)\\b")) + regexp_count(text, lit("eau|oux"))),
  )

  def langId(text: Column): Column = {
    val s = langScores(text)
    // Deterministic argmax: en > de > es > fr priority on ties, "und"
    // (unknown) when every score is zero.
    val ordered = Seq("en", "de", "es", "fr").map(l => (l, s(l)))
    val best = ordered.map(_._2).reduce((a, b) => greatest(a, b))
    ordered.foldRight(lit("und"): Column) { case ((l, sc), els) =>
      when(sc > 0 && sc === best, lit(l)).otherwise(els)
    }
  }

  // ---- PII redaction ----
  // Patterns kept in the Java∩RE2 regex subset so Spark and the DuckDB
  // oracle scrub identically. Applied email → IPv4 → phone (fixed order:
  // later patterns see earlier replacements, so ordering is part of the
  // contract).
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Count of PII hits per kind — the decision signal (drop vs scrub)
    * a curation pipeline filters on. */
  def piiCounts(text: Column): (Column, Column, Column) =
    (regexp_count(text, lit(EmailRe)),
      regexp_count(text, lit(Ipv4Re)),
      regexp_count(text, lit(PhoneRe)))

  /** Redact emails/IPv4s/phone numbers with typed placeholders — the
    * standard pre-training scrub. Pure codegen'd regexp_replace chain,
    * map-side only at any scale. */
  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  /** Order-sensitive document fingerprint (rolling-hash flavored):
    * sum over tokens of position × (hash64(token) mod P), mod P.
    * Content+order sensitive, portable (same formula in DuckDB), and a
    * pure map-side expression at scale. */
  def fingerprint(text: Column): Column = {
    val t = tokens(text)
    pmod(
      aggregate(
        zip_with(t, sequence(lit(1), size(t)), (tok, i) => i.cast("long") * pmod(hash64(tok), lit(Mod))),
        lit(0L),
        (acc, x) => acc + x),
      lit(Mod))
  }
}
