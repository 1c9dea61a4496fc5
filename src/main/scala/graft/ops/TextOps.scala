package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines:
  * tokenization, shingling, stopword/quality metrics, language-ID scoring,
  * fingerprinting, MinHash signatures and SimHash bits.
  *
  * Everything is stock Catalyst higher-order functions (`transform`,
  * `filter`, `aggregate`) over array columns — codegen-friendly, no UDFs,
  * no shuffle implied — so a 100 TB corpus processes embarrassingly
  * parallel at scan speed. Every formula is deliberately expressible in
  * ANSI/DuckDB SQL so the driver's oracle can replay it exactly.
  */
object TextOps {

  /** Whitespace tokens of lower(trim(text)). */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** BPE-ish subword tokens: letter runs, digit runs, single other chars. */
  def subwordTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Sliding word k-grams joined by a single space (1-based slice). */
  def shingles(toks: Column, k: Int): Column =
    transform(sequence(lit(1), greatest(size(toks) - lit(k - 1), lit(1))),
      i => array_join(slice(toks, i, lit(k)), " "))

  /** Count of tokens contained in `set`. */
  def tokenHits(toks: Column, set: Seq[String]): Column =
    size(filter(toks, t => t.isin(set.map(lit): _*))).cast("long")

  /** Punctuation characters (anything not alnum/whitespace). */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast("long")

  def digitCount(text: Column): Column =
    length(regexp_replace(text, "[^0-9]", "")).cast("long")

  /** English stopword sample used for quality scoring. */
  val StopwordsEn = Seq("the", "a", "of", "and", "to", "in", "is")
  val StopwordsDe = Seq("der", "die", "das", "und", "ist", "nicht", "ein")
  val StopwordsEs = Seq("el", "la", "de", "que", "y", "en", "un")
  val StopwordsFr = Seq("le", "les", "et", "une", "est", "dans", "pour")

  /** Document fingerprint: min sha256 over word 3-gram shingles — the
    * min-wise rolling-window scheme (one-permutation MinHash). */
  def fingerprint(toks: Column): Column =
    array_min(transform(shingles(toks, 3), s => sha2(s, 256)))

  /** MinHash signature row i: min over shingles of sha256(i || '|' || s).
    * Seeded string hashing keeps the signature reproducible in any engine
    * with sha256 — no engine-specific 64-bit hash needed. */
  def minhash(shingleCol: Column, i: Int): Column =
    array_min(transform(shingleCol, s => sha2(concat(lit(s"$i|"), s), 256)))

  /** One-permutation MinHash: hash every shingle ONCE
    * ([[hashedShingles]]), then derive signature row i as the min of the
    * 20-bit integer at hex offset 5i — S rows cost ONE digest per shingle
    * instead of S (the q36 hot path was 12 sha passes over the corpus). */
  def hashedShingles(shingleCol: Column): Column =
    transform(shingleCol, s => sha2(s, 256))

  def minhashFromHashes(hashes: Column, i: Int): Column =
    array_min(transform(hashes,
      h => conv(substring(h, i * 5 + 1, 5), 16, 10).cast("long")))

  /** LSH band key: hash of `rows` consecutive minhash values. */
  def band(minhashes: Seq[Column]): Column =
    sha2(concat_ws("|", minhashes: _*), 256)

  /** Rabin-Karp rolling-hash machinery: token value = 28-bit sha prefix,
    * window hash = polynomial fold mod P (B=1000003, P=2^31-1). All
    * arithmetic stays under 2^52 — exact in any engine's BIGINT. */
  val RollB = 1000003L
  val RollP = 2147483647L

  /** 28-bit integer value of a token (first 7 hex chars of its sha256). */
  def tokenValue(tok: Column): Column =
    conv(substring(sha2(tok, 256), 1, 7), 16, 10).cast("long")

  /** Polynomial hash of one window of precomputed token VALUES:
    * ((v1·B + v2)·B + …) mod P. */
  def windowHash(valueWindow: Column): Column =
    aggregate(valueWindow, lit(0L), (acc, v) => (acc * RollB + v) % RollP)

  /** Min rolling-window hash over a precomputed token-value array
    * (winnowing-style fingerprint). Materialize the values column first
    * (one sha per token) — hashing tokens inside the window transform
    * would recompute each token's sha k times. */
  def rollingMinHash(tokenValues: Column, k: Int): Column =
    array_min(transform(
      sequence(lit(1), greatest(size(tokenValues) - lit(k - 1), lit(1))),
      i => windowHash(slice(tokenValues, i, lit(k)))))

  /** PII patterns (email, international-style phone, dotted-quad IP) for
    * redaction before a corpus ships to training. Deliberately restricted
    * to constructs Java regex (Spark) and RE2 (DuckDB) evaluate
    * identically: no backreferences, no lookaround, leftmost-first
    * equivalent. */
  val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiPhone = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  val PiiIp = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Matches of `pattern` in `text` (codegen regex scan, no UDF). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** All three PII classes replaced by typed placeholder tokens. Emails
    * first (their local/domain parts would otherwise feed the phone/IP
    * scans), then phones, then IPs — the placeholders themselves contain
    * no digits, so later passes cannot re-match earlier redactions. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, PiiEmail, "<EMAIL>"),
        PiiPhone, "<PHONE>"),
      PiiIp, "<IP>")

  /** SimHash bit b (0-based, little-endian within hex nibbles) of one
    * token's sha256: bit (b%4) of hex digit (b/4+1) of the hash prefix. */
  def tokenBit(tok: Column, b: Int): Column = hashBit(sha2(tok, 256), b)

  /** Same bit extraction over an ALREADY-COMPUTED sha256 hex column —
    * hash each token once, then read all 32 bits from the stored hex
    * (32× fewer digests than hashing inside each bit expression). */
  def hashBit(hashHex: Column, b: Int): Column = {
    val hexDigit = substring(hashHex, b / 4 + 1, 1)
    val v = instr(lit("0123456789abcdef"), hexDigit) - lit(1)
    floor(v / math.pow(2, b % 4).toInt).cast("int") % 2
  }

  /** The 8-hex-char hash prefix as one 32-bit integer word — parse the
    * string ONCE, then take all 32 SimHash bits with integer shifts
    * ([[wordBit]]) instead of 32 substring/position string ops per token. */
  def hashWord32(hashHex: Column): Column =
    conv(substring(hashHex, 1, 8), 16, 10).cast("long")

  /** Bit b of [[hashWord32]], identical numbering to [[hashBit]]: bit
    * (b%4) of hex digit (b/4+1). Digit k is nibble (8-k) of the word, so
    * the shift is 4*(8-(b/4+1)) + b%4 = 28 - 4*(b/4) + b%4. */
  def wordBit(word: Column, b: Int): Column =
    shiftright(word, 28 - 4 * (b / 4) + b % 4).bitwiseAND(lit(1L)).cast("int")
}
