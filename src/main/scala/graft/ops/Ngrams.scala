package graft.ops

/** Guarded n-gram / windowed-sequence SQL-text builders (r17 verdict item
  * 1 — the last latent-bug class in the tree).
  *
  * Spark's `sequence(lo, hi)` defaults to step **-1** when `hi < lo`, so an
  * open-coded gram window `sequence(1, size(toks)-2)` run over a 1-token
  * doc yields the DESCENDING array `[1, 0, -1]` — and the mapper then
  * either emits spurious grams (concat_ws over a null slice) or throws
  * (`slice(toks, 0, n)` is an error, j67's r16 ADVICE bug). Every call
  * site used to carry its own `.where(size(toks) >= k)` in a DIFFERENT
  * function from the window — correct while someone remembers, which is
  * exactly how j67 broke. These builders put the guard INSIDE the window
  * expression (`if(size(toks) >= n, sequence(…), array())` — the empty
  * branch's ARRAY<VOID> widens to the sequence's element type), so a
  * short doc contributes zero grams no matter what the caller filters.
  * NgramLintSpec rejects any open-coded `sequence(<digit>, … size|length(`
  * in src/main outside this file; PropertySpec's short-doc sweep runs
  * every documents-reading registry key over a 0/1/2/3-token corpus.
  *
  * All builders return SQL TEXT (the call sites are `expr(...)`/SQL-string
  * registry entries); keeping them text-level means one helper serves both
  * the Column-API and SQL-registry worlds and stays trivially
  * codegen-friendly (pure builtin expressions, no UDF).
  */
private[graft] object Ngrams {

  /** 1-based n-gram start indices over token array `toks`: the guarded
    * form of `sequence(1, size(toks)-(n-1))`. EMPTY when the doc has
    * fewer than n tokens. */
  def starts(toks: String, n: Int): String = {
    require(n >= 1)
    val hi = if (n == 1) s"size($toks)" else s"size($toks) - ${n - 1}"
    s"if(size($toks) >= $n, sequence(1, $hi), array())"
  }

  /** 0-based window start indices: guarded `sequence(0, size(x)-k)`,
    * EMPTY when size(x) < k. */
  def starts0(x: String, k: Int): String = {
    require(k >= 1)
    s"if(size($x) >= $k, sequence(0, size($x) - $k), array())"
  }

  /** 1-based character q-gram start indices over string `text`: guarded
    * `sequence(1, length(text)-(q-1))`, EMPTY when the string is shorter
    * than q characters (null text → null, dropped by explode like the
    * unguarded form). */
  def charStarts(text: String, q: Int): String = {
    require(q >= 1)
    val hi = if (q == 1) s"length($text)" else s"length($text) - ${q - 1}"
    s"if(length($text) >= $q, sequence(1, $hi), array())"
  }

  /** The space-joined n-gram STARTING at the lambda variable `i`
    * (1-based, as produced by [[starts]]) — built by O(1) ELEMENT
    * INDEXING, never `slice`: `concat_ws(' ', slice(toks, i, n))` is
    * value-identical, but Catalyst's Slice materializes the WHOLE array
    * on every call, so a gram transform over it is O(len²) PER DOCUMENT
    * — the r20 pathological-row sweep measured a single 50k-token doc
    * holding the sweep for minutes, and a 100 TB crawl has far longer
    * outliers. `toks[i-1+j]` is GetArrayItem — O(1) — making the gram
    * loop linear. Within [[starts]] bounds no element is null, so
    * `concat` ≡ `concat_ws`. */
  def gramAt(toks: String, n: Int): String = {
    require(n >= 1)
    (0 until n).map {
      case 0 => s"$toks[i - 1]"
      case 1 => s"$toks[i]"
      case j => s"$toks[i + ${j - 1}]"
    }.mkString("concat(", ", ' ', ", ")")
  }

  /** Space-joined word n-grams as strings (the plain-text gram shape). */
  def grams(toks: String, n: Int): String =
    s"transform(${starts(toks, n)}, i -> ${gramAt(toks, n)})"

  /** Generic ascending `sequence(lo, hi)` that is EMPTY instead of
    * DESCENDING when `hi < lo` — for non-gram windows (chunk indices,
    * fold domains) whose upper bound is data-dependent. */
  def seqAsc(lo: String, hi: String): String =
    s"if(($hi) >= ($lo), sequence($lo, $hi), array())"

  /** Unordered index-pair enumeration over array `xs` — the capped-
    * postings pair loop: `mapper2` sees (i, j) with 0 <= i < j < size.
    * EMPTY (no spurious self/negative pairs) when size(xs) < 2. */
  def pairs(xs: String, mapper2: String): String =
    s"flatten(transform(${starts0(xs, 2)}, i -> " +
      s"transform(sequence(i+1, size($xs)-1), $mapper2)))"
}
