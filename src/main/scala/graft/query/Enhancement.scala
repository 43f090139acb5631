package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Query enhancement (SURVEY §2.8 F6-F8;
  * `/root/reference/query/enhancement.py`).
  *
  * The reference normalizes, spell-corrects (TextBlob + a double-letter
  * heuristic fallback) and expands synonyms (WordNet, ≤3 synsets, words ≥4
  * chars) with a disk cache. Queries are single strings, so this is
  * driver-side-cheap either way — but every step here is ALSO a pure column
  * expression, so enhancement can run over a BATCH of queries as one
  * DataFrame pass (the shape the reference can't do).
  *
  * WordNet isn't available offline; the synonym table is a small static map
  * with the same expansion semantics (`(word OR syn …)` emission,
  * `enhancement.py:59-126`) — swap in a broadcast dictionary table for a
  * real lexicon.
  */
object Enhancement {

  /** Punctuation marks whose runs get collapsed. Collapsing is one regex
    * per mark instead of a `([!?.,;:])\1+` backreference — RE2-based engines
    * (the DuckDB oracle) don't support pattern backreferences, and the
    * per-mark chain is the same semantics.
    */
  val PunctMarks = "!?.,;:"

  private def collapseRuns(q: Column, chars: String, min: Int, keep: Int): Column =
    chars.foldLeft(q) { (c, ch) =>
      val esc = java.util.regex.Pattern.quote(ch.toString)
      regexp_replace(c, s"$esc{$min,}", ch.toString * keep)
    }

  /** F6 normalization (`enhancement.py:26-56`): whitespace collapse,
    * smart-quote standardization, punctuation dedup.
    */
  def normalize(q: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        collapseRuns(translate(q, "‘’“”", "''\"\""), PunctMarks, min = 2, keep = 1),
        "\\s+", " "),
      "\\s+([!?.,;:])", "$1"))

  /** F8 double-letter spelling heuristic (`enhancement.py:267-319` fallback
    * path): collapse 3+ repeated letters to 2 (e.g. "goooood" → "good").
    * The TextBlob statistical correction is a model dependency; the
    * reference's own fallback is this heuristic. Per-letter chain for the
    * same RE2 reason as [[normalize]].
    */
  def fixRepeatedLetters(q: Column): Column =
    collapseRuns(q, "abcdefghijklmnopqrstuvwxyz", min = 3, keep = 2)

  /** Static synonym map (stand-in for WordNet synsets; structure mirrors
    * `enhancement.py:178-264`). Keys are query words ≥4 chars. The first
    * seven entries are the original fixture set and are PINNED — the e2e
    * oracle queries embed their expansions as literals (EngineQueries
    * `E2eEnhancedQuery`/`E2eBatch20`), so changing them breaks value-exact
    * pins. The rest is a breadth enrichment in the spirit of public
    * thesauri (WordNet-style synsets, authored here): common query/tech
    * vocabulary, 2 synonyms per head word like the reference's ≤3-synset
    * cap. Every key is chosen to NOT collide with any token of the pinned
    * e2e query texts, so existing oracle pins are untouched; the f6_enhance
    * oracle SQL is GENERATED from this map and stays in lockstep by
    * construction.
    */
  val Synonyms: Map[String, Seq[String]] = Map(
    "query" -> Seq("search", "lookup"),
    "fast" -> Seq("quick", "rapid"),
    "join" -> Seq("merge", "combine"),
    "filter" -> Seq("predicate", "where"),
    "window" -> Seq("frame", "range"),
    "error" -> Seq("fault", "failure"),
    "document" -> Seq("text", "record"),
    // ── enrichment (round 10): general/technical head words ──
    "begin" -> Seq("start", "commence"),
    "broken" -> Seq("damaged", "faulty"),
    "build" -> Seq("construct", "assemble"),
    "cache" -> Seq("buffer", "store"),
    "change" -> Seq("modify", "alter"),
    "check" -> Seq("verify", "inspect"),
    "choose" -> Seq("select", "pick"),
    "clean" -> Seq("scrub", "sanitize"),
    "close" -> Seq("shut", "terminate"),
    "column" -> Seq("field", "attribute"),
    "compute" -> Seq("calculate", "evaluate"),
    "connect" -> Seq("link", "attach"),
    "copy" -> Seq("duplicate", "replicate"),
    "count" -> Seq("tally", "total"),
    "crash" -> Seq("failure", "abort"),
    "create" -> Seq("make", "build"),
    "debug" -> Seq("troubleshoot", "diagnose"),
    "delete" -> Seq("remove", "erase"),
    "describe" -> Seq("explain", "detail"),
    "disk" -> Seq("storage", "drive"),
    "display" -> Seq("show", "render"),
    "empty" -> Seq("blank", "void"),
    "enable" -> Seq("activate", "allow"),
    "execute" -> Seq("run", "perform"),
    "explain" -> Seq("describe", "clarify"),
    "export" -> Seq("extract", "dump"),
    "fetch" -> Seq("retrieve", "obtain"),
    "find" -> Seq("locate", "discover"),
    "group" -> Seq("cluster", "bucket"),
    "huge" -> Seq("enormous", "massive"),
    "import" -> Seq("load", "ingest"),
    "improve" -> Seq("enhance", "optimize"),
    "increase" -> Seq("grow", "raise"),
    "index" -> Seq("catalog", "register"),
    "insert" -> Seq("add", "append"),
    "install" -> Seq("setup", "deploy"),
    "latency" -> Seq("delay", "lag"),
    "limit" -> Seq("bound", "cap"),
    "list" -> Seq("enumerate", "itemize"),
    "load" -> Seq("ingest", "read"),
    "machine" -> Seq("host", "server"),
    "memory" -> Seq("ram", "heap"),
    "method" -> Seq("technique", "procedure"),
    "missing" -> Seq("absent", "lost"),
    "modify" -> Seq("change", "alter"),
    "number" -> Seq("count", "quantity"),
    "optimize" -> Seq("tune", "improve"),
    "order" -> Seq("sequence", "arrange"),
    "parse" -> Seq("analyze", "interpret"),
    "partition" -> Seq("shard", "segment"),
    "primary" -> Seq("main", "principal"),
    "problem" -> Seq("issue", "trouble"),
    "process" -> Seq("handle", "execute"),
    "read" -> Seq("load", "retrieve"),
    "reduce" -> Seq("shrink", "decrease"),
    "remove" -> Seq("delete", "erase"),
    "rename" -> Seq("relabel", "retitle"),
    "replace" -> Seq("substitute", "swap"),
    "response" -> Seq("reply", "answer"),
    "schema" -> Seq("structure", "layout"),
    "script" -> Seq("program", "code"),
    "server" -> Seq("host", "machine"),
    "setup" -> Seq("install", "configure"),
    "show" -> Seq("display", "present"),
    "size" -> Seq("magnitude", "dimension"),
    "slow" -> Seq("sluggish", "laggy"),
    "speed" -> Seq("velocity", "pace"),
    "start" -> Seq("begin", "launch"),
    "stop" -> Seq("halt", "cease"),
    "storage" -> Seq("disk", "repository"),
    "stream" -> Seq("flow", "feed"),
    "string" -> Seq("text", "characters"),
    "total" -> Seq("sum", "aggregate"),
    "transform" -> Seq("convert", "translate"),
    "update" -> Seq("modify", "revise"),
    "upload" -> Seq("send", "transfer"),
    "usage" -> Seq("utilization", "consumption"),
    "verify" -> Seq("confirm", "validate"),
    "wait" -> Seq("pause", "delay"),
    "write" -> Seq("save", "store"),
    "wrong" -> Seq("incorrect", "erroneous"),
    // ── enrichment (round 11): further breadth, same ≤2-synonym shape;
    //    every key verified non-colliding with the pinned e2e texts by the
    //    EnhancementRerankSpec tripwire ──
    "abort" -> Seq("cancel", "terminate"),
    "accept" -> Seq("allow", "admit"),
    "access" -> Seq("reach", "retrieve"),
    "adjust" -> Seq("tune", "calibrate"),
    "allocate" -> Seq("assign", "reserve"),
    "analyze" -> Seq("examine", "study"),
    "append" -> Seq("add", "attach"),
    "archive" -> Seq("store", "preserve"),
    "assign" -> Seq("allocate", "designate"),
    "attach" -> Seq("connect", "affix"),
    "available" -> Seq("accessible", "ready"),
    "average" -> Seq("mean", "typical"),
    "backup" -> Seq("copy", "snapshot"),
    "benchmark" -> Seq("measure", "baseline"),
    "broadcast" -> Seq("send", "distribute"),
    "bucket" -> Seq("bin", "partition"),
    "capacity" -> Seq("volume", "limit"),
    "cleanup" -> Seq("purge", "tidy"),
    "cluster" -> Seq("group", "bunch"),
    "collect" -> Seq("gather", "accumulate"),
    "compare" -> Seq("contrast", "match"),
    "compile" -> Seq("build", "assemble"),
    "compress" -> Seq("shrink", "pack"),
    "confirm" -> Seq("verify", "acknowledge"),
    "convert" -> Seq("transform", "translate"),
    "corrupt" -> Seq("damaged", "broken"),
    "critical" -> Seq("severe", "urgent"),
    "decode" -> Seq("decipher", "interpret"),
    "decrease" -> Seq("reduce", "lower"),
    "default" -> Seq("standard", "preset"),
    "deploy" -> Seq("release", "install"),
    "detect" -> Seq("discover", "identify"),
    "directory" -> Seq("folder", "catalog"),
    "disable" -> Seq("deactivate", "turn"),
    "download" -> Seq("fetch", "pull"),
    "duplicate" -> Seq("copy", "clone"),
    "efficient" -> Seq("effective", "economical"),
    "encode" -> Seq("serialize", "represent"),
    "encrypt" -> Seq("cipher", "scramble"),
    "estimate" -> Seq("approximate", "gauge"),
    "evaluate" -> Seq("assess", "compute"),
    "examine" -> Seq("inspect", "review"),
    "expand" -> Seq("grow", "enlarge"),
    "expire" -> Seq("lapse", "timeout"),
    "extend" -> Seq("lengthen", "augment"),
    "extract" -> Seq("pull", "derive"),
    "format" -> Seq("layout", "arrange"),
    "generate" -> Seq("produce", "create"),
    "global" -> Seq("universal", "overall"),
    "ignore" -> Seq("skip", "disregard"),
    "inspect" -> Seq("examine", "audit"),
    "invalid" -> Seq("illegal", "malformed"),
    "invoke" -> Seq("call", "trigger"),
    "iterate" -> Seq("loop", "repeat"),
    "launch" -> Seq("start", "initiate"),
    "local" -> Seq("nearby", "resident"),
    "locate" -> Seq("find", "pinpoint"),
    "manage" -> Seq("administer", "control"),
    "measure" -> Seq("quantify", "gauge"),
    "message" -> Seq("notice", "communication"),
    "metric" -> Seq("measure", "statistic"),
    "migrate" -> Seq("move", "transfer"),
    "monitor" -> Seq("watch", "observe"),
    "network" -> Seq("grid", "mesh"),
    "notify" -> Seq("alert", "inform"),
    "output" -> Seq("result", "product"),
    "overflow" -> Seq("spill", "excess"),
    "parallel" -> Seq("concurrent", "simultaneous"),
    "parameter" -> Seq("argument", "setting"),
    "pattern" -> Seq("template", "motif"),
    "pending" -> Seq("waiting", "queued"),
    "permission" -> Seq("authorization", "consent"),
    "persist" -> Seq("save", "endure"),
    "prepare" -> Seq("ready", "arrange"),
    "previous" -> Seq("prior", "earlier"),
    "profile" -> Seq("measure", "characterize"),
    "publish" -> Seq("release", "announce"),
    "random" -> Seq("arbitrary", "stochastic"),
    "rebuild" -> Seq("reconstruct", "recreate"),
    "receive" -> Seq("accept", "obtain"),
    "recover" -> Seq("restore", "reclaim"),
    "refresh" -> Seq("reload", "renew"),
    "register" -> Seq("enroll", "record"),
    "reject" -> Seq("refuse", "decline"),
    "repair" -> Seq("fix", "mend"),
    "report" -> Seq("summary", "account"),
    "request" -> Seq("ask", "petition"),
    "require" -> Seq("need", "demand"),
    "resolve" -> Seq("settle", "fix"),
    "resource" -> Seq("asset", "supply"),
    "restart" -> Seq("reboot", "relaunch"),
    "restore" -> Seq("recover", "reinstate"),
    "resume" -> Seq("continue", "restart"),
    "retry" -> Seq("reattempt", "repeat"),
    "rotate" -> Seq("cycle", "turn"),
    "sample" -> Seq("subset", "specimen"),
    "schedule" -> Seq("plan", "timetable"),
    "secure" -> Seq("protect", "safe"),
    "segment" -> Seq("section", "portion"),
    "sequence" -> Seq("series", "order"),
    "session" -> Seq("connection", "sitting"),
    "shard" -> Seq("partition", "fragment"),
    "signal" -> Seq("indicator", "cue"),
    "snapshot" -> Seq("capture", "checkpoint"),
    "source" -> Seq("origin", "provenance"),
    "split" -> Seq("divide", "separate"),
    "status" -> Seq("state", "condition"),
    "submit" -> Seq("send", "post"),
    "summary" -> Seq("digest", "overview"),
    "suspend" -> Seq("pause", "halt"),
    "switch" -> Seq("toggle", "swap"),
    "syntax" -> Seq("grammar", "notation"),
    "system" -> Seq("platform", "framework"),
    "target" -> Seq("goal", "destination"),
    "temporary" -> Seq("transient", "ephemeral"),
    "thread" -> Seq("worker", "fiber"),
    "timeout" -> Seq("deadline", "expiry"),
    "token" -> Seq("symbol", "unit"),
    "trace" -> Seq("track", "log"),
    "transfer" -> Seq("move", "convey"),
    "trigger" -> Seq("activate", "fire"),
    "truncate" -> Seq("shorten", "clip"),
    "unique" -> Seq("distinct", "singular"),
    "upgrade" -> Seq("improve", "advance"),
    "valid" -> Seq("legal", "correct"),
    "vector" -> Seq("embedding", "array"),
    "version" -> Seq("revision", "release"),
    "volume" -> Seq("amount", "bulk"),
    "warning" -> Seq("caution", "alert"),
    "worker" -> Seq("executor", "agent"),
    // ── enrichment (round 12): everyday-English breadth beyond the tech
    //    vocabulary — same authored-thesaurus shape (≤2 synonyms, head ≥4
    //    chars), same non-collision tripwire ──
    "accurate" -> Seq("precise", "exact"),
    "achieve" -> Seq("attain", "accomplish"),
    "acquire" -> Seq("obtain", "gain"),
    "active" -> Seq("live", "running"),
    "actual" -> Seq("real", "true"),
    "advance" -> Seq("progress", "proceed"),
    "advice" -> Seq("guidance", "counsel"),
    "agree" -> Seq("concur", "consent"),
    "alert" -> Seq("warn", "notify"),
    "alter" -> Seq("change", "modify"),
    "amount" -> Seq("quantity", "sum"),
    "ancient" -> Seq("old", "antique"),
    "angry" -> Seq("mad", "furious"),
    "answer" -> Seq("reply", "response"),
    "apparent" -> Seq("evident", "obvious"),
    "approve" -> Seq("endorse", "ratify"),
    "argue" -> Seq("dispute", "contend"),
    "arrange" -> Seq("organize", "position"),
    "arrive" -> Seq("reach", "appear"),
    "article" -> Seq("story", "piece"),
    "assist" -> Seq("help", "support"),
    "attempt" -> Seq("try", "effort"),
    "author" -> Seq("writer", "creator"),
    "basic" -> Seq("fundamental", "elementary"),
    "beautiful" -> Seq("pretty", "lovely"),
    "believe" -> Seq("think", "trust"),
    "benefit" -> Seq("advantage", "gain"),
    "brave" -> Seq("bold", "courageous"),
    "brief" -> Seq("short", "concise"),
    "bright" -> Seq("shiny", "luminous"),
    "broad" -> Seq("wide", "extensive"),
    "busy" -> Seq("occupied", "active"),
    "calculate" -> Seq("compute", "reckon"),
    "calm" -> Seq("quiet", "peaceful"),
    "careful" -> Seq("cautious", "attentive"),
    "carry" -> Seq("haul", "transport"),
    "catch" -> Seq("capture", "grab"),
    "cause" -> Seq("reason", "origin"),
    "cheap" -> Seq("inexpensive", "economical"),
    "chief" -> Seq("main", "principal"),
    "clarify" -> Seq("explain", "simplify"),
    "clever" -> Seq("smart", "ingenious"),
    "common" -> Seq("usual", "ordinary"),
    "complete" -> Seq("finish", "entire"),
    "complex" -> Seq("complicated", "intricate"),
    "conceal" -> Seq("hide", "mask"),
    "concept" -> Seq("idea", "notion"),
    "concern" -> Seq("worry", "interest"),
    "conclude" -> Seq("finish", "deduce"),
    "condition" -> Seq("state", "requirement"),
    "consider" -> Seq("ponder", "regard"),
    "constant" -> Seq("steady", "fixed"),
    "construct" -> Seq("build", "erect"),
    "contain" -> Seq("hold", "include"),
    "continue" -> Seq("proceed", "persist"),
    "correct" -> Seq("right", "accurate"),
    "courage" -> Seq("bravery", "valor"),
    "crucial" -> Seq("vital", "essential"),
    "curious" -> Seq("inquisitive", "odd"),
    "danger" -> Seq("hazard", "peril"),
    "decide" -> Seq("determine", "resolve"),
    "decline" -> Seq("refuse", "decrease"),
    "defend" -> Seq("protect", "guard"),
    "definite" -> Seq("certain", "clear"),
    "demand" -> Seq("require", "request"),
    "demonstrate" -> Seq("show", "prove"),
    "desire" -> Seq("wish", "want"),
    "destroy" -> Seq("ruin", "demolish"),
    "determine" -> Seq("decide", "ascertain"),
    "develop" -> Seq("grow", "evolve"),
    "difficult" -> Seq("hard", "tough"),
    "diminish" -> Seq("reduce", "lessen"),
    "discover" -> Seq("find", "uncover"),
    "discuss" -> Seq("debate", "converse"),
    "distant" -> Seq("remote", "faraway"),
    "divide" -> Seq("split", "separate"),
    "donate" -> Seq("give", "contribute"),
    "doubt" -> Seq("question", "uncertainty"),
    "eager" -> Seq("keen", "enthusiastic"),
    "early" -> Seq("soon", "premature"),
    "earn" -> Seq("gain", "deserve"),
    "easy" -> Seq("simple", "effortless"),
    "effort" -> Seq("attempt", "exertion"),
    "emphasize" -> Seq("stress", "highlight"),
    "encourage" -> Seq("motivate", "inspire"),
    "enormous" -> Seq("huge", "immense"),
    "ensure" -> Seq("guarantee", "secure"),
    "entire" -> Seq("whole", "complete"),
    "essential" -> Seq("necessary", "vital"),
    "establish" -> Seq("found", "institute"),
    "exact" -> Seq("precise", "accurate"),
    "excellent" -> Seq("superb", "outstanding"),
    "explore" -> Seq("investigate", "probe"),
    "famous" -> Seq("renowned", "celebrated"),
    "final" -> Seq("last", "ultimate"),
    "finish" -> Seq("complete", "conclude"),
    "fragile" -> Seq("delicate", "brittle"),
    "frequent" -> Seq("common", "recurrent"),
    "gather" -> Seq("collect", "assemble"),
    "gentle" -> Seq("mild", "soft"),
    "genuine" -> Seq("authentic", "real"),
    "grateful" -> Seq("thankful", "appreciative"),
    "happy" -> Seq("glad", "joyful"),
    "hollow" -> Seq("empty", "void"),
    "honest" -> Seq("truthful", "sincere"),
    "idea" -> Seq("concept", "thought"),
    "identify" -> Seq("recognize", "pinpoint"),
    "illustrate" -> Seq("depict", "exemplify"),
    "imitate" -> Seq("copy", "mimic"),
    "immediate" -> Seq("instant", "prompt"),
    "important" -> Seq("significant", "essential"),
    "indicate" -> Seq("show", "signify"),
    "inform" -> Seq("tell", "notify"),
    "intelligent" -> Seq("smart", "clever"),
    "intend" -> Seq("plan", "mean"),
    "investigate" -> Seq("probe", "examine"),
    "journey" -> Seq("trip", "voyage"),
    "keep" -> Seq("retain", "preserve"),
    "known" -> Seq("familiar", "recognized"),
    "labor" -> Seq("work", "toil"),
    "leave" -> Seq("depart", "exit"),
    "little" -> Seq("small", "tiny"),
    "maintain" -> Seq("preserve", "sustain"),
    "mention" -> Seq("note", "cite"),
    "modern" -> Seq("contemporary", "current"),
    "necessary" -> Seq("required", "essential"),
    "obtain" -> Seq("acquire", "procure"),
    "obvious" -> Seq("evident", "apparent"),
    "occur" -> Seq("happen", "transpire"),
    "often" -> Seq("frequently", "regularly"),
    "operate" -> Seq("run", "function"),
    "oppose" -> Seq("resist", "contest"),
    "ordinary" -> Seq("common", "plain"),
    "perform" -> Seq("execute", "conduct"),
    "permit" -> Seq("allow", "authorize"),
    "persuade" -> Seq("convince", "influence"),
    "plain" -> Seq("simple", "unadorned"),
    "pleasant" -> Seq("agreeable", "enjoyable"),
    "portion" -> Seq("part", "share"),
    "possess" -> Seq("own", "hold"),
    "powerful" -> Seq("strong", "mighty"),
    "precise" -> Seq("exact", "accurate"),
    "predict" -> Seq("forecast", "anticipate"),
    "prevent" -> Seq("stop", "hinder"),
    "proceed" -> Seq("continue", "advance"),
    "promise" -> Seq("pledge", "vow"),
    "propose" -> Seq("suggest", "offer"),
    "protect" -> Seq("guard", "shield"),
    "provide" -> Seq("supply", "furnish"),
    "purchase" -> Seq("buy", "acquire"),
    "purpose" -> Seq("goal", "intent"),
    "rare" -> Seq("scarce", "uncommon"),
    "reason" -> Seq("cause", "rationale"),
    "recall" -> Seq("remember", "recollect"),
    "recent" -> Seq("new", "fresh"),
    "recommend" -> Seq("suggest", "advise"),
    "relevant" -> Seq("pertinent", "applicable"),
    "reliable" -> Seq("dependable", "trustworthy"),
    "remain" -> Seq("stay", "persist"),
    "remember" -> Seq("recall", "retain"),
    "repeat" -> Seq("redo", "reiterate"),
    "reveal" -> Seq("disclose", "expose"),
    "reward" -> Seq("prize", "compensation"),
    "rough" -> Seq("coarse", "uneven"),
    "sack" -> Seq("bag", "pouch"),
    "satisfy" -> Seq("please", "fulfill"),
    "scatter" -> Seq("disperse", "spread"),
    "select" -> Seq("choose", "pick"),
    "separate" -> Seq("divide", "detach"),
    "serious" -> Seq("grave", "earnest"),
    "severe" -> Seq("harsh", "extreme"),
    "silent" -> Seq("quiet", "mute"),
    "similar" -> Seq("alike", "comparable"),
    "simple" -> Seq("easy", "plain"),
    "steady" -> Seq("stable", "constant"),
    "strange" -> Seq("odd", "peculiar"),
    "strong" -> Seq("powerful", "sturdy"),
    "sudden" -> Seq("abrupt", "unexpected"),
    "sufficient" -> Seq("enough", "adequate"),
    "suggest" -> Seq("propose", "recommend"),
    "support" -> Seq("assist", "uphold"),
    "tiny" -> Seq("small", "minute"),
    "tired" -> Seq("weary", "exhausted"),
    "typical" -> Seq("usual", "representative"),
    "understand" -> Seq("comprehend", "grasp"),
    "urgent" -> Seq("pressing", "critical"),
    "useful" -> Seq("helpful", "practical"),
    "usual" -> Seq("normal", "customary"),
    "vacant" -> Seq("empty", "unoccupied"),
    "vague" -> Seq("unclear", "indistinct"),
    "various" -> Seq("diverse", "assorted"),
    "vast" -> Seq("huge", "immense"),
    "visible" -> Seq("apparent", "evident"),
    "wealthy" -> Seq("rich", "affluent"),
    "whole" -> Seq("entire", "complete"),
    "wide" -> Seq("broad", "expansive"),
    "wise" -> Seq("sage", "prudent"),
    "yield" -> Seq("produce", "surrender"))

  /** 33-word stop set the reference skips during expansion
    * (`enhancement.py:86-95` — abridged to the same spirit).
    */
  val ExpansionStopwords: Set[String] = Set(
    "the", "a", "an", "and", "or", "but", "in", "on", "at", "to", "for",
    "of", "with", "is", "are", "was", "were", "be", "been", "being",
    "have", "has", "had", "do", "does", "did", "will", "would", "could",
    "should", "may", "might", "must")

  /** F7 synonym expansion over a token array: each word ≥4 chars, not a
    * stopword, with synonyms becomes `(word OR syn1 OR syn2)`; other words
    * pass through. Returns the expanded query string.
    */
  def expandSynonyms(tokens: Column): Column = {
    val entries = Synonyms.toSeq.sortBy(_._1).map { case (w, syns) =>
      struct(lit(w).as("w"), lit((w +: syns).mkString("(", " OR ", ")")).as("exp"))
    }
    val dict = map_from_entries(array(entries: _*))
    array_join(
      transform(tokens, t =>
        when(length(t) >= 4 && !t.isin(ExpansionStopwords.toSeq.map(lit): _*)
          && map_contains_key(dict, t), element_at(dict, t))
          .otherwise(t)),
      " ")
  }

  /** Full enhancement chain on a raw query column: normalize → repeated-
    * letter fix → lowercase tokenize → synonym expansion
    * (`enhancement.py:404-444` pipeline order).
    */
  def enhance(q: Column): Column =
    expandSynonyms(
      graft.functions.TextFunctions.tokenize(fixRepeatedLetters(lower(normalize(q)))))

  /** Full enhancement over a query BATCH with vocabulary spelling
    * correction in the reference's pipeline position
    * (`enhancement.py:404-444`: normalize → spelling → synonyms):
    * normalize → repeated-letter fix → tokenize → [[Spelling]] correction
    * against the corpus vocabulary → synonym expansion. Returns
    * `(qidCol, enhanced)`. The no-vocab chain stays the pure column
    * expression [[enhance]].
    */
  def enhanceBatch(queries: org.apache.spark.sql.DataFrame, qidCol: String,
                   textCol: String,
                   vocab: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val normalized = queries.select(col(qidCol),
      fixRepeatedLetters(lower(normalize(col(textCol)))).as("_norm"))
    val corrected = Spelling.correctQueries(normalized, qidCol, "_norm", vocab)
    corrected.select(col(qidCol),
      expandSynonyms(graft.functions.TextFunctions.tokenize(col("corrected")))
        .as("enhanced"))
  }

  /** Driver-side evaluation of [[enhance]] on a single string. Applied to
    * a literal the whole chain is REFERENCE-free, so the resolved
    * expression evaluates directly on the driver — no Spark job and no
    * whole-stage codegen compile of the 30+-regex chain (which dominated
    * single-query pipeline latency). `foldable` alone is not the right
    * gate: the synonym-expansion step is a higher-order function whose
    * lambda makes the tree non-foldable, yet interpreted eval is fine —
    * gating on foldable silently sent every call down the one-row-job
    * fallback (measured: a 32-task job per query). Bit-identical to the
    * column version by construction (same expression tree, spec-asserted).
    */
  /** The enhancement chain, analyzed ONCE per session against a real input
    * ATTRIBUTE (not a literal) and bound for interpreted eval via
    * [[graft.functions.BindOnce]]. The per-call plan round trip was cheap
    * with the 7-entry fixture map but became ~100 ms/call once the synonym
    * map grew to ~90 entries — analysis + optimization re-walked the
    * 30-regex + map-literal tree for every query, and queryBatch paid it
    * per query.
    */
  def enhanceValue(spark: org.apache.spark.sql.SparkSession, q: String): String = {
    val expr = graft.functions.BindOnce(spark, "enhance")(enhance)
    // synchronized: RegExpReplace caches its last compiled pattern in the
    // (shared) tree; driver-side callers are effectively single-threaded,
    // this keeps concurrent use safe anyway
    val out = expr.synchronized {
      expr.eval(org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(q)))
    }
    if (out == null) null else out.toString
  }
}
