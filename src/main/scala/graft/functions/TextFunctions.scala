package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline: tokenization,
  * deterministic content hashing, shingling, MinHash signatures, SimHash
  * fingerprints, stopword-based language scoring.
  *
  * Everything is built from Spark SQL higher-order functions
  * (`transform`/`aggregate`/`filter` — codegen'd, no Scala UDFs in the hot
  * path), and every hash is *portable arithmetic* — a polynomial rolling
  * hash mod 1e9+7 over code points — so an external engine (the DuckDB
  * oracle, a Python verifier) can reproduce values bit-for-bit. Engine-
  * specific hashes (xxhash64, murmur) would be faster but unverifiable;
  * at 100 TB the hash cost is dwarfed by the shuffle these ops feed.
  */
object TextFunctions {

  /** Modulus of the portable polynomial hash (prime, < 2^30 so that
    * 31*h + 127 never overflows a long and bit tricks stay exact). */
  val HashMod = 1000000007L

  /** MinHash family: h_j(x) = ((31j+1251)·x + (17j+7397)) mod HashMod. */
  val MinhashK = 8
  val MinhashBands = 4 // 4 bands × 2 rows

  /** SimHash width: 62 bits — two 31-bit halves voted by independent
    * remixes of each token hash (Simhash62). Wide enough that pigeonhole
    * bands stay ≥ 2^15–2^31 values (scale-safe shuffle keys); still a
    * positive BIGINT in the oracle. */
  val SimhashBits = 62

  /** Whitespace tokenization; documents.text is single-space joined. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword tokenization: the GPT-2-style pre-tokenizer classes —
    * letter runs, digit runs, single punctuation marks — via a regex kept
    * deliberately portable (no lookarounds/classes that differ between
    * Java regex and the oracle's RE2): a letter run, a digit run, or one
    * non-alphanumeric non-space char per token. Real BPE then merges
    * within these pre-tokens, so this count upper-bounds (and closely
    * tracks) the trained-vocab token count — the signal length filters and
    * cost models actually need. */
  val BpeTokenRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  def bpeTokens(text: Column): Column = regexp_extract_all(text, lit(BpeTokenRegex), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Portable polynomial rolling hash of a string:
    * fold over code points, acc = (acc*31 + cp) mod 1e9+7.
    * Native expression (graft.expressions.PolyHash) — the HOF formulation
    * (aggregate over split(s,"")) pays interpreter dispatch per character. */
  def polyHash(s: Column): Column = graft.expressions.ArrayExprs.poly_hash(s)

  /** The ONE implementation of salted hash-bucket assignment:
    * hash(salt:id) mod buckets. Every deterministic partition of the
    * corpus (splits, samples, fixtures) goes through here so the salt
    * separator and hash can never drift between operators. */
  def bucketHash(id: Column, salt: String, buckets: Long): Column =
    pmod(polyHash(concat(lit(salt + ":"), id)), lit(buckets))

  /** The deterministic 0–99 assignment hash behind every hash-based
    * partition of the corpus. With the default salt this is THE single
    * definition of 90/5/5 train/val/test membership (doc_split):
    * decontamination (train < 90, test >= 95) and any other split-aware
    * operator must use it, or its population silently drifts from the
    * published split — real train/test leakage. Other assignments
    * (e.g. corpus-vs-increment fixtures) pass their own salt so they are
    * independent of the train/test split yet share this one
    * implementation. */
  def splitHash(docId: Column, salt: String = "split"): Column =
    bucketHash(docId, salt, 100L)

  /** Word k-shingles: sliding windows of k tokens joined by a space.
    * Short documents (< k tokens) yield an empty array. */
  def shingles(text: Column, k: Int): Column = {
    val t = tokens(text)
    when(size(t) >= k,
      transform(sequence(lit(0), size(t) - k),
        i => concat_ws(" ", slice(t, i + lit(1), lit(k)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-token polynomial hashes — the shared intermediate for MinHash and
    * SimHash. Materialize this ONCE as a column before fanning out into
    * per-hash-function aggregates: Catalyst does not CSE lambda
    * subexpressions, so inlining it into k branches recomputes it k times. */
  def tokenHashes(text: Column): Column =
    transform(tokens(text), t => polyHash(t))

  /** k-shingle hashes combined from token hashes (no shingle strings are
    * ever materialized): sh_i = fold of (acc*8191 + th) mod HashMod over
    * the window's token hashes. Native one-pass expression — the HOF form
    * pays k element_at interpreter dispatches per window in the dedup hot
    * path. Short documents (< k tokens) yield an empty array; NULL input
    * propagates NULL (standard expression semantics — and what the DuckDB
    * oracle's list_transform does too; the old HOF form's empty-array-on-
    * null actually diverged from the oracle). */
  def shingleHashes(tokenHashesCol: Column, k: Int): Column =
    graft.expressions.ArrayExprs.shingle_combine(tokenHashesCol, k, packed = false)

  /** 60-bit shingle identifiers: two independent polynomial combines of the
    * window's token hashes (multipliers 8191 and 8209), packed as
    * h1·HashMod + h2. Used as the equi-join key for exact Jaccard — 8-byte
    * shuffle keys instead of shingle strings, with collision probability
    * ~n²/2^60 (negligible below ~10^8 distinct shingles per corpus).
    * Native one-pass expression (see shingleHashes). */
  def shingleIds(tokenHashesCol: Column, k: Int): Column =
    graft.expressions.ArrayExprs.shingle_combine(tokenHashesCol, k, packed = true)

  /** PII patterns for the redaction pass. Deliberately restricted to
    * regex constructs with identical semantics in Java regex and RE2
    * (character classes, bounded quantifiers, ASCII \d and \b) so the
    * DuckDB oracle reproduces matches exactly; no lookaround, no
    * backreferences (RE2 has neither). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** C4-style PII redaction: emails, IPv4 addresses, and SSN-shaped ids
    * replaced with typed placeholder tokens. Emails are scrubbed first so
    * an address's host part cannot be half-matched by the later passes.
    * Pure codegen'd string expressions — at 100 TB this runs in the scan
    * stage with zero shuffle. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailRe), lit("<EMAIL>")),
        lit(Ipv4Re), lit("<IP>")),
      lit(SsnRe), lit("<SSN>"))

  /** MinHash signature (array of MinhashK longs) over a shingle-hash array
    * (see shingleHashes). Native one-pass expression; min over the multiset
    * equals min over the distinct set, so values match the
    * array_distinct-based oracle definition exactly. */
  def minhashSigFromHashes(shingleHashesCol: Column): Column =
    graft.expressions.ArrayExprs.minhash_sig(shingleHashesCol)

  /** LSH band values for a MinHash signature: MinhashBands longs, band b
    * packing its r = MinhashK/MinhashBands signature rows as
    * s₁·HashMod + s₂ — equality of the packed value ⟺ equality of both
    * rows, and the band join shuffles 8-byte keys instead of dash-joined
    * strings. Documents sharing any band value become dedup candidates.
    * (Packing two sub-2³⁰ values stays under 2⁶³; r > 2 would overflow —
    * widen to a hash or string key if the family changes.) */
  def minhashBands(sig: Column): Column = {
    val r = MinhashK / MinhashBands
    require(r == 2, "packed band keys are implemented for r = 2 rows/band")
    transform(sequence(lit(0), lit(MinhashBands - 1)),
      b => element_at(sig, b * lit(r) + 1) * lit(HashMod) + element_at(sig, b * lit(r) + 2))
  }

  /** 62-bit SimHash over the token *multiset* (duplicates weigh in, as in
    * Charikar's scheme): bit b is set iff the sum of ±1 votes from each
    * token's remixed hash bit b is positive. `phs` is a tokenHashes column.
    * Native one-pass expression (62 × n interpreted lambda steps otherwise). */
  def simhashFromHashes(phs: Column): Column =
    graft.expressions.ArrayExprs.simhash62(phs)

  /** Per-language stopword tables for the stopword-hit language-ID
    * heuristic and stop_ratio quality signal — standard public stopword
    * vocabularies (~150 words per language; the zh table is the common
    * function-word/character set), embedded because the build is
    * zero-egress. The DuckDB oracle SQL is generated from this same
    * constant, so growing a table can never drift parity. Words are plain
    * lowercase tokens (no apostrophe forms — the corpus tokenizer is
    * whitespace-based and SQL quoting stays trivial). */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(
      "the", "and", "of", "to", "a", "in", "is", "that", "it", "was",
      "for", "on", "are", "as", "with", "his", "they", "i", "at", "be",
      "this", "have", "from", "or", "one", "had", "by", "word", "but",
      "not", "what", "all", "were", "we", "when", "your", "can", "said",
      "there", "use", "an", "each", "which", "she", "do", "how", "their",
      "if", "will", "up", "other", "about", "out", "many", "then", "them",
      "these", "so", "some", "her", "would", "make", "like", "him",
      "into", "time", "has", "look", "two", "more", "write", "go", "see",
      "no", "way", "could", "people", "my", "than", "first", "been",
      "who", "its", "now", "find", "long", "down", "day", "did", "get",
      "come", "made", "may", "part", "over", "new", "sound", "take",
      "only", "little", "work", "know", "place", "year", "live", "me",
      "back", "give", "most", "very", "after", "thing", "our", "just",
      "name", "good", "sentence", "man", "think", "say", "great",
      "where", "help", "through", "much", "before", "line", "right",
      "too", "mean", "old", "any", "same", "tell", "boy", "follow",
      "came", "want", "show", "also", "around", "form", "three", "small",
      "set", "put", "end", "does", "another", "well", "large", "must",
      "big", "even", "such", "because", "turn", "here", "why", "ask",
      "went", "men", "read", "need", "land", "different", "home", "us",
      "move", "try", "kind", "hand", "picture", "again", "change", "off",
      "play", "spell", "air", "away", "animal", "house", "point", "page",
      "letter", "mother", "answer", "found", "study", "still", "learn",
      "should", "america", "world"),
    "es" -> Seq(
      "el", "la", "de", "que", "y", "en", "los", "del", "se", "las",
      "por", "un", "para", "con", "no", "una", "su", "al", "lo", "como",
      "mas", "pero", "sus", "le", "ya", "o", "este", "si", "porque",
      "esta", "entre", "cuando", "muy", "sin", "sobre", "tambien", "me",
      "hasta", "hay", "donde", "quien", "desde", "todo", "nos", "durante",
      "todos", "uno", "les", "ni", "contra", "otros", "ese", "eso",
      "ante", "ellos", "e", "esto", "mi", "antes", "algunos", "unos",
      "yo", "otro", "otras", "otra", "tanto", "esa", "estos",
      "mucho", "quienes", "nada", "muchos", "cual", "poco", "ella",
      "estar", "estas", "algunas", "algo", "nosotros", "mio", "tuyo",
      "ellas", "sea", "ser", "son", "era", "eran", "fue", "fueron",
      "estamos", "estan", "estaba", "estaban", "he", "ha",
      "hemos", "han", "habia", "habian", "tengo", "tiene", "tenemos",
      "tienen", "tenia", "tenian", "hacer", "hace", "hacen", "hacia",
      "puede", "pueden", "podia", "podian", "debe", "deben", "asi",
      "aqui", "alli", "ahora", "despues", "luego", "pues", "aunque",
      "cada", "vez", "bien", "mal", "solo", "tan", "menos", "segun",
      "decir", "dice", "dicen", "dijo", "dos", "tres", "primero",
      "misma", "mismo", "nuevo", "nueva", "gran", "grandes", "anos",
      "dia", "dias", "parte", "tiempo", "vida", "mundo", "casa",
      "más", "también", "está", "están", "sí", "así", "aquí", "allí",
      "después", "años", "día", "días", "qué", "quién", "cómo", "él",
      "mí", "había", "habían", "tenía", "tenían", "hacía", "podía",
      "podían", "según", "sólo"),
    "fr" -> Seq(
      "le", "la", "de", "et", "les", "des", "un", "une", "du", "en",
      "au", "aux", "ce", "ces", "cette", "dans", "par", "pour", "sur",
      "avec", "sans", "sous", "vers", "chez", "entre", "contre", "apres",
      "avant", "depuis", "pendant", "il", "elle", "ils", "elles", "je",
      "tu", "nous", "vous", "on", "se", "sa", "son", "ses", "leur",
      "leurs", "mon", "ma", "mes", "ton", "ta", "tes", "notre", "votre",
      "nos", "vos", "qui", "que", "quoi", "dont", "ou", "quand",
      "comment", "pourquoi", "si", "ne", "pas", "plus", "moins", "tres",
      "bien", "mal", "tout", "tous", "toute", "toutes", "autre",
      "autres", "meme", "aussi", "encore", "deja", "toujours", "jamais",
      "souvent", "parfois", "ici", "ailleurs", "alors", "ainsi",
      "donc", "mais", "car", "or", "ni", "soit", "etre", "est", "sont",
      "etait", "etaient", "fut", "furent", "sera", "seront", "suis",
      "es", "sommes", "etes", "avoir", "ai", "as", "avons", "avez",
      "ont", "avait", "avaient", "eut", "aura", "auront", "faire",
      "fait", "font", "faisait", "peut", "peuvent", "pouvait", "doit",
      "doivent", "devait", "va", "vont", "allait", "vient", "viennent",
      "cela", "ceci", "celui", "celle", "ceux", "celles", "chaque",
      "quelque", "quelques", "plusieurs", "certains", "certaines",
      "beaucoup", "peu", "trop", "assez", "deux", "trois", "premier",
      "premiere", "dernier", "derniere", "grand", "grande", "petit",
      "petite", "nouveau", "nouvelle", "jour", "jours", "temps", "fois",
      "annee", "annees", "monde", "vie", "homme", "femme",
      "après", "très", "déjà", "être", "était", "étaient", "année",
      "années", "où", "même", "première", "dernière", "été", "à"),
    "de" -> Seq(
      "der", "die", "und", "das", "von", "zu", "den", "ein", "eine",
      "einer", "eines", "einem", "einen", "in", "im", "ist", "sind",
      "war", "waren", "wird", "werden", "wurde", "wurden", "sein",
      "seine", "seiner", "seinem", "seinen", "ihr", "ihre", "ihrer",
      "ihrem", "ihren", "mit", "fur", "auf", "aus", "bei", "nach",
      "uber", "unter", "vor", "durch", "gegen", "ohne", "um", "an",
      "am", "als", "auch", "aber", "oder", "wenn", "dann", "doch",
      "noch", "nur", "schon", "so", "sehr", "mehr", "weniger", "alle",
      "allem", "allen", "aller", "alles", "man", "kann", "konnen",
      "konnte", "konnten", "muss", "mussen", "musste", "mussten",
      "soll", "sollen", "sollte", "sollten", "will", "wollen", "wollte",
      "wollten", "darf", "durfen", "mag", "mogen", "hat", "haben",
      "hatte", "hatten", "habe", "hast", "bin", "bist", "sich", "nicht",
      "kein", "keine", "keiner", "keinem", "keinen", "es", "er", "sie",
      "wir", "ich", "du", "ihnen", "ihm", "ihn", "mich", "mir", "dich",
      "dir", "uns", "euch", "was", "wer", "wie", "wo", "warum",
      "welche", "welcher", "welches", "dieser", "diese", "dieses",
      "diesem", "diesen", "jeder", "jede", "jedes", "jedem", "jeden",
      "einige", "einigen", "manche", "solche", "beim", "vom", "zum",
      "zur", "hier", "da", "dort", "heute", "morgen", "immer", "nie",
      "wieder", "jetzt", "also", "etwa", "etwas", "nichts",
      "viel", "viele", "vielen", "ganz", "gut", "neue", "neuen",
      "ersten", "zwei", "drei", "jahr", "jahre", "jahren", "zeit",
      "tag", "welt", "leben", "mensch", "menschen", "teil",
      "für", "über", "können", "könnte", "könnten", "müssen", "müsste",
      "müssten", "dürfen", "mögen", "wäre", "wären", "hätte", "hätten",
      "würde", "würden", "größte", "während", "zunächst", "außerdem"),
    "zh" -> Seq(
      "的", "了", "是", "在", "我", "有", "和", "不", "人", "这",
      "他", "们", "中", "来", "上", "大", "为", "个", "国", "到",
      "说", "时", "要", "就", "出", "会", "可", "也", "你", "对",
      "生", "能", "而", "子", "那", "得", "于", "着", "下", "自",
      "之", "年", "过", "发", "后", "作", "里", "用", "道", "行",
      "所", "然", "家", "种", "事", "成", "方", "多", "经", "去",
      "法", "学", "如", "都", "同", "现", "当", "没", "动", "面",
      "起", "看", "定", "天", "分", "还", "进", "好", "小", "部",
      "其", "些", "主", "样", "理", "心", "她", "本", "前", "开",
      "但", "因", "只", "从", "想", "实", "日", "军", "者", "意",
      "无", "力", "它", "与", "长", "把", "机", "十", "民", "第",
      "公", "此", "已", "工", "使", "情", "明", "性", "知", "全",
      "三", "又", "关", "点", "正", "业", "外", "将", "两", "高",
      "间", "由", "问", "很", "最", "重", "并", "物", "手", "应",
      "战", "向", "头", "文", "体", "政", "美", "相", "见", "被",
      "利", "什", "二", "等", "产", "或", "新", "己", "制", "身"))

  // the tables are the single source of truth for generated oracle SQL:
  // duplicates are membership-harmless today but would diverge the two
  // engines under any future per-entry-counting scorer — reject them
  require(stopwords.forall { case (_, ws) => ws.distinct == ws },
    "stopword tables must be duplicate-free: " + stopwords.collect {
      case (c, ws) if ws.distinct != ws => s"$c: ${ws.diff(ws.distinct).mkString(",")}"
    }.mkString("; "))

  /** Count of tokens belonging to `set` (lowercased input expected).
    * Native codegen'd kernel: the HOF filter form is CodegenFallback and
    * takes the whole scan stage out of WholeStageCodegen — language ID
    * evaluates this once per row per LANGUAGE (PlanContractSpec pins the
    * codegen span). Returns LONG. */
  def stopwordHits(text: Column, set: Seq[String]): Column =
    graft.expressions.ArrayExprs.count_in_set(tokens(lower(text)), set)

  /** Predicted language: argmax of stopword hits, ties broken by language
    * code order (deterministic; 'en' first among all-zero scores would be
    * wrong — alphabetical order is the documented rule). */
  def langId(text: Column): Column = {
    val scored = stopwords.sortBy(_._1).map { case (code, set) =>
      struct(stopwordHits(text, set).as("score"), lit(code).as("code"))
    }
    // argmax by (score, reversed-code) via array_max on (score, negated rank)
    // simpler: fold keeping the best (score strictly greater wins; ties keep
    // the earlier = alphabetically smaller code)
    val first = scored.head
    val folded = scored.tail.foldLeft(first) { (best, cand) =>
      when(cand.getField("score") > best.getField("score"), cand).otherwise(best)
    }.getField("code")
    // NULL text has no prediction: the fold's null-score comparisons would
    // otherwise decay to the first code ('de') while a SQL CASE over null
    // scores falls through to its ELSE — NULL is the value both agree on
    when(text.isNotNull, folded)
  }
}
