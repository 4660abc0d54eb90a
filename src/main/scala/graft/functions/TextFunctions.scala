package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the LLM-data-pipeline operators.
  *
  * Everything here composes codegen'd Spark builtins (split, regexp,
  * higher-order array functions) — no UDFs in the hot path — so plans
  * stay inside WholeStageCodegen and push work to every executor core.
  *
  * Cross-engine determinism: the only hash primitive is [[hash60]],
  * md5-derived and bit-identical in DuckDB via
  * `('0x' || substr(md5(s),1,15))::bigint`, which lets the driver's
  * oracle replicate MinHash/SimHash exactly.
  */
object TextFunctions {

  /** Stopword list shared with the oracle SQL (keep in sync). */
  val StopWords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "on", "for")

  /** Whitespace tokens of trimmed text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Whitespace-normalized lowercase text. */
  def normText(c: Column): Column =
    lower(regexp_replace(trim(c), "\\s+", " "))

  /** Deterministic 60-bit hash replicable in DuckDB (15 hex chars of md5
    * parsed base-16; 60 bits so it always fits a signed long). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** PII patterns shared with the oracle SQL (ASCII classes only, no
    * lookaround — the Java and RE2 dialects parse them identically).
    * Order matters: emails and IPs are scrubbed before phone numbers
    * so digit runs inside them are never half-matched. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** Redact emails, IPv4 addresses and phone numbers (in that order)
    * with typed placeholder tags. Pure codegen'd regexp_replace chain —
    * shuffle-free, runs at scan speed on every executor. */
  def piiScrub(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** BPE-ish subword count: alnum runs + individual punctuation marks
    * (regex kept to ASCII classes so Java and RE2 dialects agree). */
  def bpeTokenCount(c: Column): Column =
    regexp_count(c, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"))

  /** Count of punctuation characters (explicit class, dialect-safe). */
  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[.,!?;:]", ""))

  /** Count of tokens that are stopwords (codegen'd hash-set probe —
    * the interpreted `filter(isInCollection)` twin was the hot lambda
    * on the t2/quality scan path). */
  def stopwordCount(c: Column): Column =
    expressions.Kernels.countInSet(tokens(lower(c)), StopWords)

  /** Heuristic document quality in [0,1]: length saturation +
    * stopword-rate band + punctuation sparsity. Mirrored 1:1 in the
    * oracle SQL — all arithmetic in double, rounded to 4. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lengthTerm = least(nTok / lit(100.0), lit(1.0))
    val stopTerm =
      least(stopwordCount(text).cast("double") / greatest(nTok, lit(1.0)) *
        lit(4.0), lit(1.0))
    val punctTerm = lit(1.0) -
      least(punctCount(text).cast("double") / greatest(nTok, lit(1.0)),
        lit(1.0))
    round(lit(0.4) * lengthTerm + lit(0.3) * stopTerm + lit(0.3) * punctTerm, 4)
  }

  /** Content fingerprint: md5 of normalized text (exact-dedup key). */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Full Unicode canonicalization for cross-source dedup keys:
    * NFC normalize → strip accents → lowercase → collapse whitespace
    * (explicit ASCII class so the Java and RE2 dialects agree) → trim.
    * Replays in DuckDB as `trim(regexp_replace(lower(strip_accents(
    * nfc_normalize(text))), '[ \t\n\r\f]+', ' ', 'g'))`. The NFC +
    * accent-strip step is one codegen'd static call per row
    * ([[expressions.Kernels.nfcStrip]]); everything else is builtins. */
  def unicodeNormalize(c: Column): Column =
    trim(regexp_replace(lower(expressions.Kernels.nfcStrip(c)),
      "[ \\t\\n\\r\\f]+", " "))

  /** Gopher-style compression-ratio quality signal: zlib-compressed
    * size / raw UTF-8 size. Repetitious boilerplate compresses far
    * below ~0.3; natural prose sits ~0.3–0.7; high-entropy noise
    * approaches (or exceeds) 1. Entirely per-row codegen — scan
    * speed at any corpus size. */
  def compressionRatio(c: Column): Column =
    expressions.Kernels.deflateLen(c).cast("double") /
      greatest(octet_length(c), lit(1)).cast("double")

  /** Count of the single most frequent bigram in a token array,
    * computed ENTIRELY per row (one codegen'd hash-count pass; the
    * earlier declarative twin — sort_array + longest-equal-run fold —
    * computed the same integer through an interpreted struct fold).
    * No explode, no groupBy: the repetition filters built on this
    * stay at scan speed at any corpus size. 0 for arrays with fewer
    * than 2 tokens. Property-tested against a naive recount
    * (PipelineSpec). */
  def topBigramCount(toks: Column): Column =
    expressions.Kernels.topBigramCount(toks)

  /** k-token shingles ("n-grams of tokens"), distinct, space-joined.
    * Empty array when the document has fewer than k tokens. Native
    * kernel — identical output to the declarative
    * array_distinct(transform(sequence, concat_ws(slice))) chain,
    * without its per-element interpreted-lambda cost. */
  def shingles(c: Column, k: Int): Column =
    graft.functions.expressions.Kernels.shingles(tokens(c), k)

  /** MinHash signature: one md5-derived base hash per shingle, then `n`
    * universal-hash permutations mod 2³¹−1 in a native codegen kernel
    * ([[graft.functions.expressions.Kernels.minhash]]) — one expensive
    * hash per shingle instead of n, and the permutation loop compiles
    * to straight Java (the declarative form was the bench bottleneck). */
  def minhashSignature(shingleCol: Column, n: Int): Column =
    // xxhash64 (codegen'd) as the base hash: the signature itself is
    // never oracle-compared — candidate pairs are verified with exact
    // Jaccard — so the cheap hash is safe here, unlike simhash/
    // fingerprint which replay in DuckDB via md5-derived hash60.
    graft.functions.expressions.Kernels.minhash(
      transform(shingleCol, s => xxhash64(s).bitwiseAND(lit(Long.MaxValue))), n)

  /** 60-bit SimHash over whitespace tokens: bit j is set iff the sum of
    * (+1/-1 for bit j of each token hash) is positive. Token hashes via
    * builtins; the 60×N bit loop is a native codegen kernel with
    * identical bit semantics to the oracle SQL. */
  def simhash(text: Column): Column =
    graft.functions.expressions.Kernels.simhash60(
      transform(tokens(text), t => hash60(t)))
}
