package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders (SURVEY §2 D). Everything here composes
  * built-in codegen'd functions — no UDFs — so whole-stage codegen spans the
  * full expression tree and each has an exact DuckDB-SQL twin for the oracle
  * (kept adjacent in `*Sql` so they never drift).
  */
object TextFunctions {

  /** Non-overlapping occurrences of literal `sub` — a native single-pass
    * indexOf walk (graft.plans.CountSubstring; zero string copies). The SQL
    * twin keeps the engine-portable replace trick
    * (len(x) - len(replace(x, sub, ''))) / len(sub), which removes the same
    * left-to-right non-overlapping matches, so both sides count identically.
    */
  def occurrences(c: Column, sub: String): Column =
    graft.plans.CountSubstring.count(c, sub)

  def occurrencesSql(x: String, sub: String): String = {
    val q = sub.replace("'", "''")
    s"(length($x) - length(replace($x, '$q', ''))) / ${sub.length}"
  }

  /** Whitespace token count. */
  def wsTokens(c: Column): Column = size(split(c, " "))
  def wsTokensSql(x: String): String = s"len(str_split($x, ' '))"

  /** BPE-ish subword estimate: alnum runs + isolated non-space symbols.
    * (A real BPE vocab isn't available offline; this regex count is the
    * standard cheap proxy: words + punctuation marks.)
    */
  def bpeTokens(c: Column): Column =
    regexp_count(c, lit("[a-z0-9]+|[^a-z0-9 ]"))
  def bpeTokensSql(x: String): String =
    s"len(regexp_extract_all($x, '[a-z0-9]+|[^a-z0-9 ]'))"

  /** Fixed 256-pair mini-BPE vocabulary (H18): the engine's deterministic,
    * EXACTLY-replayable stand-in for tokenizer-true counts. One merge round
    * of byte-pair encoding with a fixed vocabulary, applied greedily
    * left-to-right without overlap: token count = chars − merges, where
    * merges = global non-overlapping regex matches of the 256 pair
    * alternation (all alternatives are length 2, so leftmost-first vs
    * leftmost-longest engines count identically — Java regex and RE2 agree
    * by construction). Pairs are code points; on ASCII text that IS
    * byte-level BPE's first round. Honest residual: real BPE iterates
    * merges with learned priorities over a 10⁵ vocabulary — this column is
    * a calibration input that captures actual bigram statistics (unlike the
    * pure-length `bpe_est` proxy), not a tokenizer replacement.
    *
    * The list is frequency-seeded (common English bigrams, space/comma
    * transitions) and deterministically completed to exactly 256 by
    * frequency-ordered letter products; every pair is [a-z ,]{2}, so the
    * alternation needs no regex escaping in either engine.
    */
  val miniBpeMerges: Seq[String] = {
    val seeded = Seq(
      "e ", " t", "th", "he", "s ", " a", "d ", "in", "t ", "er",
      "an", " s", "re", "on", " w", "at", "en", "nd", "ti", " o",
      "es", "or", "te", "of", " i", "ed", "is", "it", "al", "ar",
      "st", "to", "nt", "ng", "se", "ha", " c", "le", " b", "ou",
      "io", " f", " m", "ve", "co", "me", "de", "hi", "ri", "ro",
      "ic", "ne", "ea", "ra", "ce", " h", " p", "li", "ch", "ll",
      "be", "ma", "si", "om", "ur", "ca", "el", "ta", "la", "ns",
      " d", "di", "fo", "ho", "pe", "ec", "pr", "no", "ct", "us",
      "ac", "ot", "il", "tr", "ly", "nc", "et", "ut", "ss", "so",
      "rs", "un", "lo", "wa", "ge", "ie", "wh", "ee", "wi", "em",
      "ad", "ol", "rt", "po", "we", "na", "ul", "ni", "ts", "mo",
      "ow", "pa", "im", "mi", "ai", "sh", "ir", "su", "id", "os",
      "iv", "ia", "am", "fi", "ci", "vi", "pl", "ig", "tu", "ev",
      "ld", "ry", "mp", "fe", "bl", "ab", "gh", "ty", "op", "wo",
      "sa", "ay", "ex", "ke", "ui", "pt", "ag", "ht", "ue", "do",
      "if", "ef", "da", "ck", "ub", "od", "bu", "ov", "rn", "ap",
      "cl", "va", "ep", "ga", "du", "y ", "r ", "n ", "o ", ", ",
      "g ", "l ", "f ", "m ", "h ", "k ", "w ", "p ", " e", " r",
      " n", " l", " g", " u", " j", " k", " v", " y", " q", " z"
    ).distinct
    val order = "etaoinshrdlcumwfgypbvkjxqz"
    val fill = for (a <- order; b <- order) yield s"$a$b"
    val all = (seeded ++ fill.filterNot(seeded.contains)).take(256)
    require(all.length == 256 && all.distinct.length == 256 &&
      all.forall(_.matches("[a-z ,]{2}")), "malformed mini-BPE vocabulary")
    all
  }

  private val miniBpePattern = miniBpeMerges.mkString("|")

  /** Mini-BPE token count: chars − greedy non-overlapping pair merges, via
    * the one-pass native kernel ([[graft.plans.MiniBpeCount]]: one table
    * lookup per byte). The SQL twin keeps the equivalent regex form — all
    * alternatives are length 2, so global regex matching counts exactly the
    * same merges (CorpusSpec pins it; the 256-way alternation costs Java's
    * backtracking engine O(alternatives) per position, which is why the
    * engine side doesn't use regexp_count). */
  def miniBpeTokens(c: Column): Column =
    length(c) - graft.plans.MiniBpeCount.count(c)

  def miniBpeTokensSql(x: String): String =
    s"(length($x) - len(regexp_extract_all($x, '$miniBpePattern')))"

  /** MULTI-ROUND BPE merge table (SURVEY §2 H18b; round-10 verdict item 2):
    * real BPE applies its merge list SEQUENTIALLY — each rule rewrites the
    * symbol sequence produced by all earlier rules, so later rules merge
    * MERGED symbols ("t"+"h"→[th], [th]+"e"→[the], " "+[the]→[ the]) and a
    * frequent word collapses to ONE token, which a single merge round can
    * never do. The single-round [[miniBpeTokens]] stays as the cheap
    * calibration count; this is the honest tokenizer-shaped upgrade the
    * budget/packing operators key on.
    *
    * Three generations (32 base bigrams → 16 second-order → 8 third-order;
    * frequency order is public English letter statistics), each merged pair
    * mapping to one private-use-area codepoint (U+E000+) so every rule stays
    * "2 codepoints → 1 codepoint" and both engines replay it as a chain of
    * literal `replace` passes — left-to-right, non-overlapping, replacement
    * never rescanned, identical semantics in java.lang.String.replace,
    * DuckDB replace(), and the [[graft.plans.BpeTokens]] kernel.
    */
  val bpeMergeTable: Seq[(String, Char)] = {
    val g1 = Seq(
      "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
      "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
      "st", "to", "nt", "ng", "se", "ha", "ou", "io", "le", "ve",
      "co", "me")
    val s1 = g1.indices.map(i => (0xE000 + i).toChar)
    def m1(p: String): Char = s1(g1.indexOf(p))
    // gen-2 symbols are positional: rule i -> U+E020+i. Reachability note:
    // gen-1 applies sequentially, so in "ion" the earlier "on" rule always
    // wins ("io" never forms) — the ion-family compounds therefore build on
    // i+[on] and [ti]+[on], the sequences gen-1 ACTUALLY leaves behind
    // (verified by the CorpusSpec reference-state-machine traces).
    val theSym = 0xE020.toChar; val ingSym = 0xE021.toChar
    val andSym = 0xE022.toChar; val ionSym = 0xE023.toChar
    val tionSym = 0xE024.toChar
    val g2 = Seq(
      s"${m1("th")}e",    // E020 "the"
      s"${m1("in")}g",    // E021 "ing"
      s"${m1("an")}d",    // E022 "and"
      s"i${m1("on")}",    // E023 "ion"  (i + [on])
      s"${m1("ti")}${m1("on")}", // E024 "tion" ([ti] + [on])
      s"${m1("er")} ", s"${m1("es")} ", s"${m1("ed")} ",
      s" ${m1("th")}", s"${m1("on")} ", s"${m1("at")} ",
      s"${m1("en")} ", s" ${m1("co")}", s" ${m1("re")}",
      s" ${m1("st")}", s"${m1("ar")} ")
    val g3 = Seq(
      s" $theSym",            // " the"
      s"$ingSym ",            // "ing "
      s"$andSym ",            // "and "
      s"$tionSym ",           // "tion "
      s"${m1("at")}$ionSym",  // "ation" ([at] + [ion])
      s"$ionSym ",            // "ion "
      s"$theSym ")            // "the "
    val s2 = g2.indices.map(i => (0xE020 + i).toChar)
    val s3 = g3.indices.map(i => (0xE040 + i).toChar)
    val rules = g1.zip(s1) ++ g2.zip(s2) ++ g3.zip(s3)
    require(rules.map(_._2).distinct.length == rules.length &&
      rules.forall(_._1.length == 2), "malformed BPE merge table")
    rules
  }

  /** K-round BPE token count: codepoints of the text after the full
    * [[bpeMergeTable]] replace chain — the native one-buffer kernel.
    */
  def bpeTokensK(c: Column): Column = graft.plans.BpeTokens.count(c)

  /** SQL twin: the literal nested-replace chain (each rule one replace(),
    * applied in table order), then length(). DuckDB's replace is the same
    * left-to-right non-overlapping literal rewrite as the kernel's pass.
    */
  def bpeTokensKSql(x: String): String = {
    val chain = bpeMergeTable.foldLeft(x) { case (acc, (p, sym)) =>
      s"replace($acc, '$p', '$sym')"
    }
    s"length($chain)"
  }

  /** Language-marker stopword sets. The heuristic scores each language by
    * total occurrences of its markers (space-padded to approximate word
    * boundaries) and argmaxes with a fixed precedence order.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " a ", " of "),
    "de" -> Seq(" der ", " die ", " und "),
    "es" -> Seq(" el ", " que ", " los "),
    "fr" -> Seq(" le ", " les ", " et "),
    "zh" -> Seq(" zh ", " ni ", " ma "))

  private def langScore(c: Column, markers: Seq[String]): Column =
    markers.map(m => occurrences(c, m)).reduce(_ + _)

  /** Deterministic argmax over language scores; ties resolve in declaration
    * order (en > de > es > fr > zh), unknown if all scores are zero.
    *
    * Scores go through ONE array column and argmax is array_position of
    * array_max — a pairwise when-chain would re-embed every score
    * expression O(langs) times and codegen's subexpression elimination
    * doesn't fully recover it (measured ~2x on the corpus).
    */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val scores = array(langMarkers.map { case (_, ms) => langScore(padded, ms) }: _*)
    val langsArr = array(langMarkers.map(m => lit(m._1)): _*)
    val best = array_max(scores)
    // coalesce: NULL text must yield 'und' (like the SQL twin's CASE ...
    // ELSE 'und'), not propagate NULL through the argmax
    coalesce(
      when(best <= 0, "und")
        .otherwise(element_at(langsArr, array_position(scores, best).cast("int"))),
      lit("und"))
  }

  def langIdSql(x: String): String = {
    val padded = s"(' ' || $x || ' ')"
    val scoreExprs = langMarkers.map { case (l, ms) =>
      l -> ms.map(m => occurrencesSql(padded, m)).mkString(" + ")
    }
    val best = scoreExprs.map(_._2).map(e => s"($e)").mkString("GREATEST(", ", ", ")")
    val cases = scoreExprs.map { case (l, e) => s"WHEN ($e) = $best THEN '$l'" }
    s"CASE WHEN $best <= 0 THEN 'und' ${cases.mkString(" ")} ELSE 'und' END"
  }

  /** CHAR-TRIGRAM language classifier (SURVEY §2 D14; round-10 verdict
    * item 5): the fastText-style feature shape — per-language weighted
    * character n-gram counts, argmax over integer scores — where
    * [[langId]]'s stopword argmax fails: languages sharing function words
    * (French relative "que" votes Spanish under the marker sets; a marker-
    * free sentence scores 'und' despite screaming orthography like
    * "sch"/"ing"). Weights are hand-rounded log-odds of each trigram's
    * discriminativeness (public orthographic statistics — "sch"/"ich" for
    * German, "eau"/" je" for French, "ción"→"cio" for Spanish...), kept as
    * small INTEGERS so every score is an exact integer sum of
    * (count × weight) — hash-gateable with zero float exposure (the H22
    * fixed-point discipline, applied at model-definition time instead of
    * per-row). Counting shares [[occurrences]] (non-overlapping
    * left-to-right, identical in both engines).
    */
  val langTrigrams: Seq[(String, Seq[(String, Int)])] = Seq(
    "en" -> Seq("the" -> 3, "ing" -> 2, "and" -> 2, " th" -> 2,
      "ion" -> 1, "of " -> 1),
    "de" -> Seq("sch" -> 3, "ich" -> 3, "der" -> 2, "ein" -> 2,
      "und" -> 2, "cht" -> 2),
    "es" -> Seq("cio" -> 3, "ado" -> 2, "los" -> 2, " el" -> 2,
      "que" -> 1, "nte" -> 1),
    "fr" -> Seq("eau" -> 3, " je" -> 3, "ais" -> 2, "les" -> 2,
      "eur" -> 2, "est" -> 1),
    "zh" -> Seq("zho" -> 3, " ni" -> 2, " ma" -> 2))

  /** Argmax over the integer trigram scores; ties resolve in declaration
    * order, all-zero → 'und' (the [[langId]] conventions).
    */
  def langIdNgram(text: Column): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val scores = array(langTrigrams.map { case (_, gs) =>
      gs.map { case (g, w) => occurrences(padded, g) * w }.reduce(_ + _)
    }: _*)
    val langsArr = array(langTrigrams.map(m => lit(m._1)): _*)
    val best = array_max(scores)
    coalesce(
      when(best <= 0, "und")
        .otherwise(element_at(langsArr, array_position(scores, best).cast("int"))),
      lit("und"))
  }

  /** The winning integer score (0 for 'und'/null) — emitted alongside the
    * label so the gate hashes the score surface, not just the argmax.
    */
  def langIdNgramScore(text: Column): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val scores = langTrigrams.map { case (_, gs) =>
      gs.map { case (g, w) => occurrences(padded, g) * w }.reduce(_ + _)
    }
    coalesce(greatest(lit(0) +: scores: _*), lit(0)).cast("long")
  }

  def langIdNgramSql(x: String): String = {
    val padded = s"(' ' || $x || ' ')"
    val scoreExprs = langTrigrams.map { case (l, gs) =>
      l -> gs.map { case (g, w) => s"${occurrencesSql(padded, g)} * $w" }
        .mkString(" + ")
    }
    val best = scoreExprs.map(_._2).map(e => s"($e)").mkString("GREATEST(", ", ", ")")
    val cases = scoreExprs.map { case (l, e) => s"WHEN ($e) = $best THEN '$l'" }
    s"CASE WHEN $best <= 0 THEN 'und' ${cases.mkString(" ")} ELSE 'und' END"
  }

  def langIdNgramScoreSql(x: String): String = {
    val padded = s"(' ' || $x || ' ')"
    val scoreExprs = langTrigrams.map { case (_, gs) =>
      gs.map { case (g, w) => s"${occurrencesSql(padded, g)} * $w" }
        .mkString("(", " + ", ")")
    }
    s"CAST(GREATEST(0, ${scoreExprs.mkString(", ")}) AS BIGINT)"
  }

  /** Quality ratios, rounded to 6 dp so engine float quirks can't flip the
    * compare: alpha ratio, space ratio, stopword-per-token ratio, mean token
    * length.
    */
  def alphaRatio(c: Column): Column =
    round(length(regexp_replace(c, "[^a-z]", "")).cast("double") / length(c), 6)
  def alphaRatioSql(x: String): String =
    s"ROUND(CAST(length(regexp_replace($x, '[^a-z]', '', 'g')) AS DOUBLE) / length($x), 6)"

  def spaceRatio(c: Column): Column =
    round(occurrences(c, " ").cast("double") / length(c), 6)
  def spaceRatioSql(x: String): String =
    s"ROUND(CAST(${occurrencesSql(x, " ")} AS DOUBLE) / length($x), 6)"

  def stopwordRatio(c: Column): Column = {
    val padded = concat(lit(" "), c, lit(" "))
    val stops = Seq(" the ", " a ", " of ", " and ", " to ")
    round(stops.map(sw => occurrences(padded, sw)).reduce(_ + _).cast("double") /
      wsTokens(c), 6)
  }
  def stopwordRatioSql(x: String): String = {
    val padded = s"(' ' || $x || ' ')"
    val stops = Seq(" the ", " a ", " of ", " and ", " to ")
    val occ = stops.map(sw => occurrencesSql(padded, sw)).mkString(" + ")
    s"ROUND(CAST($occ AS DOUBLE) / ${wsTokensSql(x)}, 6)"
  }

  def meanTokenLen(c: Column): Column =
    round(length(call_function("replace", c, lit(" "), lit(""))).cast("double") / wsTokens(c), 6)
  def meanTokenLenSql(x: String): String =
    s"ROUND(CAST(length(replace($x, ' ', '')) AS DOUBLE) / ${wsTokensSql(x)}, 6)"

  /** Normalized-content fingerprint: md5 over lowercased,
    * whitespace-collapsed text. md5 is bit-identical across engines.
    */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(c), "\\s+", " "))
  def fingerprintSql(x: String): String =
    s"md5(regexp_replace(lower($x), '\\s+', ' ', 'g'))"

  /** Non-empty whitespace tokens as an array (empty strings from leading/
    * trailing/double spaces dropped, so both engines agree on boundaries).
    */
  def words(c: Column): Column = filter(split(c, " "), w => w =!= "")
  def wordsSql(x: String): String =
    s"list_filter(str_split($x, ' '), w -> w <> '')"

  /** Positional word 3-grams over a words array — the unit of the
    * within-document repetition signal (Gopher-style quality filtering
    * measures what fraction of a doc is repeated phrases). Empty below
    * 3 words; 1-based indexing matches between engines.
    */
  def grams3(w: Column): Column =
    when(size(w) >= 3,
      transform(sequence(lit(1), size(w) - 2),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))
  def grams3Sql(w: String): String =
    s"""CASE WHEN len($w) >= 3
        THEN list_transform(generate_series(1, len($w) - 2),
               i -> $w[i] || ' ' || $w[i+1] || ' ' || $w[i+2])
        ELSE CAST([] AS VARCHAR[]) END"""
}
