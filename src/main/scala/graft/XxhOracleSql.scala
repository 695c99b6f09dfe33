package graft

/** DuckDB-SQL replay of Spark's xxHash64 (XXH64, Cyan4973's public spec;
  * Spark hashes UTF-8 bytes with seed 42) — the generator behind the
  * oracle twins of every xxhash64-valued query (`doc_fingerprint`,
  * `dedup_simhash`, `simhash_pairs`, `dedup_minhash`).
  *
  * Construction notes, each load-bearing:
  *  - 64-bit wrapping arithmetic runs in HUGEINT with & / >> / << bit
  *    masks (128-bit `%` is a division — 3× slower end to end), and a
  *    64×64 product is SPLIT into 32-bit halves because the full product
  *    overflows even signed 128. DuckDB binds `<<`/`>>` LOOSER than
  *    `+`/`*`, so every shift is explicitly parenthesized.
  *  - Each hash is a CHAIN of MATERIALIZED single-expression CTE stages:
  *    un-materialized CTEs inline per reference and the nested mul64
  *    expressions (which reference their argument 3×) blow up
  *    exponentially; SELECT-* carries were the next bottleneck, so each
  *    stage carries only the live state.
  *  - Input strings are decoded ONCE into a byte-list column
  *    (`list_transform(split(s,''), unicode)`) — repeated
  *    substr/unicode inside nested expressions dominated early versions.
  *  - Strings ≤ 63 bytes ⇒ at most ONE 32-byte stripe, so the stripe
  *    phase is a bounded unroll guarded by `CASE len >= 32` instead of a
  *    recursion. Fixture invariants that make this exact: all hashed
  *    strings are ASCII (unicode(c) == the UTF-8 byte) and tokens ≤ 8 /
  *    shingles ≤ 44 bytes — both asserted by the fixtures.
  *  - Validation: `dedup_simhash` emits 500 hash-valued outputs that
  *    match Spark bit-for-bit (value-sensitive, unlike the pair queries,
  *    which are invariant under any deterministic hash for exact-dup
  *    corpora); raw 64-lane minhash signatures were also compared
  *    Spark-vs-DuckDB during development.
  */
object XxhOracleSql {
  private val M64 = BigInt(1) << 64
  private val M32 = BigInt(1) << 32
  private val MK64 = M64 - 1
  private val MK32 = M32 - 1
  private val P1 = BigInt("11400714785074694791")
  private val P2 = BigInt("14029467366897019727")
  private val P3 = BigInt("1609587929392839161")
  private val P4 = BigInt("9650029242287828579")
  private val P5 = BigInt("2870177450012600261")

  /** DuckDB replay of the engine's Knuth keep hash
    * ([[graft.operators.TextAnalysis.keepHashPpm]]): the id is
    * SALT-FOLDED below 2³¹−1 before the multiply, so the product stays
    * under 2⁶³ on both engines — plain BIGINT arithmetic, no HUGEINT
    * wrap games. The fold is the identity for every id < 2³¹−1 (all
    * gate fixtures); past that it is what keeps ANSI Spark from
    * THROWING on the multiply (the pre-round-16 wrap replay replayed a
    * wrap the engine no longer survives to produce — 100×-rung
    * surrogate keys reach ~1e10). ids are non-negative by fixture
    * contract, so a plain `%` is the engine's pmod. */
  def knuthKeepPpm(idCol: String): String =
    s"CAST(((($idCol) % 2147483647) * 2654435761) % 1000000 AS BIGINT)"

  private def mul64(a: String, b: BigInt): String = {
    val blo = b % M32; val bhi = b >> 32
    s"(( (($a) & $MK32) * $blo" +
      s" + ((((($a) & $MK32) * $bhi" +
      s" + (($a) >> 32) * $blo) & $MK32) << 32) ) & $MK64)"
  }
  private def mul64c(a: String, b: String): String =
    s"(( (($a) & $MK32) * (($b) & $MK32)" +
      s" + ((((($a) & $MK32) * (($b) >> 32)" +
      s" + (($a) >> 32) * (($b) & $MK32)) & $MK32) << 32) ) & $MK64)"
  private def rotl(a: String, r: Int): String =
    s"(((($a) << $r) & $MK64) + (($a) >> ${64 - r}))"
  private def add64(a: String, b: String): String =
    s"((($a) + ($b)) & $MK64)"
  private def byteAt(p: String): String =
    s"COALESCE(__bl[$p], CAST(0 AS HUGEINT))"
  private def lane(off: String, nBytes: Int): String =
    (0 until nBytes).map(j =>
      s"${byteAt(s"($off) + ${j + 1}")} * ${BigInt(256).pow(j)}")
      .mkString("(", " + ", ")")

  /** Emit the staged-CTE chain hashing column `scol` of CTE `src` with
    * XXH64(seed); output CTE exposes `keys ++ scol ++ out` with `out` a
    * HUGEINT in [0, 2^64). */
  private def emitXxh64(tag: String, src: String, keys: Seq[String],
      scol: String, seed: Long, out: String): (Seq[String], String) = {
    val t = tag
    val seedu = (BigInt(seed) + M64) % M64
    val ctes = Seq.newBuilder[String]
    var cur = src
    val base = (keys :+ scol).mkString(", ")
    def stage(sfx: String, expr: String, name: String,
        carry: Seq[String]): Unit = {
      val nm = s"${t}_$sfx"
      val cols = (base +: carry).mkString(", ")
      ctes += s"$nm AS MATERIALIZED (SELECT $cols, $expr AS $name FROM $cur)"
      cur = nm
    }
    val n = s"${t}_n"
    stage("bl",
      s"list_transform(split($scol, ''), c -> CAST(unicode(c) AS HUGEINT))",
      "__bl", Seq.empty)
    stage("len", s"length($scol)", n, Seq("__bl"))
    val vInits = Seq((seedu + P1 + P2) % M64, (seedu + P2) % M64,
      seedu, (seedu - P1 + M64) % M64)
    var vs = Seq.empty[String]
    for (i <- 0 until 4) {
      val acc = add64(vInits(i).toString, mul64(lane(s"${8 * i}", 8), P2))
      stage(s"v${i + 1}", mul64(rotl(s"($acc)", 31), P1), s"${t}_v${i + 1}",
        Seq("__bl", n) ++ vs)
      vs = vs :+ s"${t}_v${i + 1}"
    }
    val hm = add64(add64(rotl(s"${t}_v1", 1), rotl(s"${t}_v2", 7)),
      add64(rotl(s"${t}_v3", 12), rotl(s"${t}_v4", 18)))
    stage("hs0", hm, s"${t}_hs0", Seq("__bl", n) ++ vs)
    var prev = s"${t}_hs0"
    for (i <- 0 until 4) {
      val r0 = mul64(rotl(mul64(s"${t}_v${i + 1}", P2), 31), P1)
      stage(s"hs${i + 1}", add64(mul64(s"xor($prev, $r0)", P1), P4.toString),
        s"${t}_hs${i + 1}", Seq("__bl", n) ++ vs.drop(i + 1))
      prev = s"${t}_hs${i + 1}"
    }
    stage("h0", add64(
      s"(CASE WHEN $n >= 32 THEN $prev ELSE CAST(${(seedu + P5) % M64} AS HUGEINT) END)",
      n), s"${t}_h0", Seq("__bl", n))
    val o = s"${t}_o"
    stage("off", s"CASE WHEN $n >= 32 THEN 32 ELSE 0 END", o,
      Seq("__bl", n, s"${t}_h0"))
    prev = s"${t}_h0"
    for (c <- 0 until 3) {
      val k = mul64(rotl(mul64(lane(s"$o + ${8 * c}", 8), P2), 31), P1)
      val step = add64(mul64(rotl(s"xor($prev, $k)", 27), P1), P4.toString)
      stage(s"c$c",
        s"CASE WHEN $n - $o >= ${8 * (c + 1)} THEN $step ELSE $prev END",
        s"${t}_c$c", Seq("__bl", n, o))
      prev = s"${t}_c$c"
    }
    val off4 = s"$o + (($n - $o) // 8) * 8"
    val step4 = add64(mul64(rotl(
      s"xor($prev, ${mul64(lane(s"($off4)", 4), P1)})", 23), P2), P3.toString)
    stage("t4", s"CASE WHEN ($n - $o) % 8 >= 4 THEN $step4 ELSE $prev END",
      s"${t}_t4", Seq("__bl", n, o))
    prev = s"${t}_t4"
    val offb = s"$o + (($n - $o) // 8) * 8 + " +
      s"(CASE WHEN ($n - $o) % 8 >= 4 THEN 4 ELSE 0 END)"
    for (j <- 0 until 3) {
      val stepb = mul64(rotl(
        s"xor($prev, ${mul64(byteAt(s"($offb) + ${j + 1}"), P5)})", 11), P1)
      stage(s"t1$j", s"CASE WHEN ($n - $o) % 4 > $j THEN $stepb ELSE $prev END",
        s"${t}_t1$j", Seq("__bl", n, o))
      prev = s"${t}_t1$j"
    }
    stage("av1", s"xor($prev, $prev >> 33)", s"${t}_a1", Seq.empty)
    stage("av2", mul64(s"${t}_a1", P2), s"${t}_a2", Seq.empty)
    stage("av3", s"xor(${t}_a2, ${t}_a2 >> 29)", s"${t}_a3", Seq.empty)
    stage("av4", mul64(s"${t}_a3", P3), s"${t}_a4", Seq.empty)
    stage("out", s"xor(${t}_a4, ${t}_a4 >> 32)", out, Seq.empty)
    (ctes.result(), cur)
  }

  private def signed(col: String): String =
    s"CAST(CASE WHEN $col >= ${BigInt(1) << 63} THEN $col - $M64 " +
      s"ELSE $col END AS BIGINT)"

  /** Spark `HashExpression` element step for LONG array elements:
    * XXH64.hashLong(elem, seed) incl. final avalanche, staged. */
  private def hashLongStages(tag: String, src: String, keys: Seq[String],
      elem: String, seedCol: String, out: String,
      carryElems: Seq[String]): (Seq[String], String) = {
    val t = tag
    val ctes = Seq.newBuilder[String]
    var cur = src
    val base = keys.mkString(", ")
    def stage(sfx: String, expr: String, name: String): Unit = {
      val nm = s"${t}_$sfx"
      val cols = (base +: carryElems).mkString(", ")
      ctes += s"$nm AS MATERIALIZED (SELECT $cols, $expr AS $name FROM $cur)"
      cur = nm
    }
    val eu = s"((CAST($elem AS HUGEINT) + $M64) & $MK64)"
    val k = mul64(rotl(mul64(eu, P2), 31), P1)
    val h0 = add64(seedCol, ((P5 + 8) % M64).toString)
    stage("h1", s"xor(($h0), $k)", s"${t}_h1")
    stage("h2", add64(mul64(rotl(s"${t}_h1", 27), P1), P4.toString), s"${t}_h2")
    stage("a1", s"xor(${t}_h2, ${t}_h2 >> 33)", s"${t}_a1")
    stage("a2", mul64(s"${t}_a1", P2), s"${t}_a2")
    stage("a3", s"xor(${t}_a2, ${t}_a2 >> 29)", s"${t}_a3")
    stage("a4", mul64(s"${t}_a3", P3), s"${t}_a4")
    stage("o", s"xor(${t}_a4, ${t}_a4 >> 32)", out)
    (ctes.result(), cur)
  }

  /** Shared simhash pipeline: CTEs ending in `sh(id, simhash)`. */
  private def simhashCore: Seq[String] = {
    val head = Seq(
      """tok AS MATERIALIZED (SELECT doc_id, w, COUNT(*) AS cnt FROM (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        |  FROM documents) t GROUP BY 1, 2)""".stripMargin,
      "dtok AS MATERIALIZED (SELECT DISTINCT w FROM tok)")
    val (hCtes, hFin) = emitXxh64("x", "dtok", Seq.empty, "w", 42L, "hu")
    val tail = Seq(
      s"th AS MATERIALIZED (SELECT w, hu FROM $hFin)",
      """votes AS MATERIALIZED (
        |  SELECT t.doc_id, b.b,
        |    SUM(t.cnt * (CASE WHEN ((hu >> b.b) & 1) = 1
        |      THEN 1 ELSE -1 END)) AS v
        |  FROM tok t JOIN th USING (w)
        |  CROSS JOIN (SELECT unnest(range(0, 64)) AS b) b
        |  GROUP BY 1, 2)""".stripMargin,
      s"""sh AS MATERIALIZED (
        |  SELECT doc_id AS id, ${signed("bits")} AS simhash FROM (
        |    SELECT doc_id, CAST(SUM(CASE WHEN v > 0
        |      THEN (CAST(1 AS HUGEINT) << b) ELSE 0 END) AS HUGEINT) AS bits
        |    FROM votes GROUP BY 1) q)""".stripMargin)
    head ++ hCtes ++ tail
  }

  def dedupSimhashSql: String =
    "WITH " + simhashCore.mkString(",\n") + "\nSELECT id, simhash FROM sh"

  def simhashPairsSql(maxDist: Int): String = {
    val ctes = simhashCore ++ Seq(
      s"""shu AS MATERIALIZED (SELECT id,
        |  (CAST(simhash AS HUGEINT) + $M64) & $MK64 AS u FROM sh)""".stripMargin,
      """bands AS MATERIALIZED (
        |  SELECT id, u, b.b AS bno, (u >> (56 - 8 * b.b)) & 255 AS bv
        |  FROM shu CROSS JOIN (SELECT unnest(range(0, 8)) AS b) b)""".stripMargin,
      s"""prs AS (
        |  SELECT DISTINCT x.id AS a, y.id AS b,
        |    CAST(bit_count(xor(CAST(x.u & ${(BigInt(1) << 63) - 1} AS BIGINT),
        |                       CAST(y.u & ${(BigInt(1) << 63) - 1} AS BIGINT)))
        |       + (CASE WHEN (x.u >> 63) <> (y.u >> 63) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS hamming
        |  FROM bands x JOIN bands y
        |    ON x.bno = y.bno AND x.bv = y.bv AND x.id < y.id)""".stripMargin)
    "WITH " + ctes.mkString(",\n") +
      s"\nSELECT a, b, hamming FROM prs WHERE hamming <= $maxDist"
  }

  def docFingerprintSql: String = {
    val head = Seq(
      """grams AS MATERIALIZED (
        |  SELECT doc_id, substr(text, i, 8) AS g FROM (
        |    SELECT doc_id, text,
        |      unnest(range(1, greatest(length(text) - 7, 1) + 1)) AS i
        |    FROM documents) t)""".stripMargin,
      "dg AS MATERIALIZED (SELECT DISTINCT g FROM grams)")
    val (hCtes, hFin) = emitXxh64("f", "dg", Seq.empty, "g", 42L, "hu")
    val ctes = head ++ hCtes ++ Seq(
      s"gh AS MATERIALIZED (SELECT g, ${signed("hu")} AS h FROM $hFin)")
    "WITH " + ctes.mkString(",\n") +
      "\nSELECT gr.doc_id, MIN(h) AS fp FROM grams gr JOIN gh USING (g) " +
      "GROUP BY 1"
  }

  /** Winnowing replay ([[graft.operators.TextAnalysis.winnowFingerprints]]
    * twin, k=8 w=4): the [[docFingerprintSql]] gram/hash chain kept
    * per-position, then each length-4 hash window picks its minimum with
    * the rightmost tie-break (ORDER BY h ASC, i DESC — the paper's
    * rule), distinct selections out. Short docs degenerate exactly as
    * the engine: < k chars → one short gram; < w grams → one whole-doc
    * window. */
  def winnowFingerprintsSql: String = {
    val k = graft.operators.TextAnalysis.WinnowK
    val w = graft.operators.TextAnalysis.WinnowW
    val head = Seq(
      s"""grams AS MATERIALIZED (
        |  SELECT doc_id, i, substr(text, i, $k) AS g FROM (
        |    SELECT doc_id, text,
        |      unnest(range(1, greatest(length(text) - ${k - 1}, 1) + 1))
        |        AS i
        |    FROM documents) t)""".stripMargin,
      "dg AS MATERIALIZED (SELECT DISTINCT g FROM grams)")
    val (hCtes, hFin) = emitXxh64("f", "dg", Seq.empty, "g", 42L, "hu")
    val ctes = head ++ hCtes ++ Seq(
      s"gh AS MATERIALIZED (SELECT g, ${signed("hu")} AS h FROM $hFin)",
      """ph AS MATERIALIZED (
        |  SELECT gr.doc_id, gr.i, gh.h FROM grams gr JOIN gh USING (g))""".stripMargin,
      s"""wins AS (SELECT doc_id,
        |    unnest(range(1, greatest(m - ${w - 1}, 1) + 1)) AS j, m
        |  FROM (SELECT doc_id, MAX(i) AS m FROM ph GROUP BY 1) t)""".stripMargin,
      s"""sel AS (SELECT doc_id, i, h FROM (
        |  SELECT w.doc_id, p.i, p.h, row_number() OVER (
        |      PARTITION BY w.doc_id, w.j ORDER BY p.h ASC, p.i DESC)
        |      AS rn
        |    FROM wins w JOIN ph p ON p.doc_id = w.doc_id
        |      AND p.i >= w.j AND p.i <= least(w.j + ${w - 1}, w.m)) u
        |  WHERE rn = 1)""".stripMargin)
    "WITH " + ctes.mkString(",\n") +
      "\nSELECT DISTINCT doc_id, CAST(i AS BIGINT) AS pos, h AS fp FROM sel"
  }

  /** `winnow_pairs` twin: the [[winnowFingerprintsSql]] chain with its
    * final read-out swapped for a distinct-(doc, fp) inverted-index
    * self-join — common fingerprints df-capped first, overlap gated,
    * both literals GENERATED from the engine's shared constants. */
  def winnowPairsSql: String = {
    val maxDf = graft.operators.TextAnalysis.WinnowMaxDf
    val minShared = graft.operators.TextAnalysis.WinnowMinShared
    val base = winnowFingerprintsSql
    val withPart = base.substring(0, base.indexOf("\nSELECT"))
    withPart +
      ",\nfps AS MATERIALIZED (SELECT DISTINCT doc_id, h FROM sel)" +
      s""",
        |rare AS (SELECT h FROM fps GROUP BY h
        |  HAVING COUNT(*) <= $maxDf),
        |kept AS (SELECT doc_id, h FROM fps JOIN rare USING (h))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= $minShared""".stripMargin
  }

  def dedupMinhashSql: String = {
    val head = Seq(
      """tokp AS MATERIALIZED (SELECT doc_id, w, pos FROM (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w,
        |    unnest(range(1,
        |      len(regexp_split_to_array(trim(lower(text)), '\s+')) + 1)) AS pos
        |  FROM documents) t)""".stripMargin,
      """shing AS MATERIALIZED (SELECT DISTINCT a.doc_id,
        |    a.w || ' ' || b.w || ' ' || c.w || ' ' || d.w || ' ' || e.w AS s
        |  FROM tokp a JOIN tokp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |  JOIN tokp c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
        |  JOIN tokp d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
        |  JOIN tokp e ON e.doc_id = a.doc_id AND e.pos = a.pos + 4)""".stripMargin,
      "dsh AS MATERIALIZED (SELECT DISTINCT s FROM shing)")
    val (h1Ctes, h1Fin) = emitXxh64("p", "dsh", Seq.empty, "s", 42L, "hu1")
    val (h2Ctes, h2Fin) =
      emitXxh64("q", h1Fin, Seq("hu1"), "s", 0x9747b28cL, "hu2")
    var ctes = head ++ h1Ctes ++ h2Ctes ++ Seq(
      s"sh2 AS MATERIALIZED (SELECT s, hu1, hu2 FROM $h2Fin)",
      s"""sigm AS MATERIALIZED (
        |  SELECT g.doc_id, i.i,
        |    MIN(${signed("((h.hu1 + i.i * h.hu2) & " + MK64 + ")")}) AS sv
        |  FROM shing g JOIN sh2 h USING (s)
        |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i
        |  GROUP BY 1, 2)""".stripMargin,
      """bande AS MATERIALIZED (
        |  SELECT doc_id, i // 4 AS band,
        |    MAX(CASE WHEN i % 4 = 0 THEN sv END) AS e0,
        |    MAX(CASE WHEN i % 4 = 1 THEN sv END) AS e1,
        |    MAX(CASE WHEN i % 4 = 2 THEN sv END) AS e2,
        |    MAX(CASE WHEN i % 4 = 3 THEN sv END) AS e3,
        |    CAST(42 AS HUGEINT) AS seed0
        |  FROM sigm GROUP BY 1, 2)""".stripMargin)
    var cur = "bande"
    for (j <- 0 until 4) {
      val (cs, nxt) = hashLongStages(s"bh$j", cur, Seq("doc_id", "band"),
        s"e$j", if (j == 0) "seed0" else s"bh${j - 1}_out", s"bh${j}_out",
        carryElems = ((j + 1) until 4).map(m => s"e$m"))
      ctes = ctes ++ cs
      cur = nxt
    }
    ctes = ctes ++ Seq(
      s"bk AS MATERIALIZED (SELECT doc_id, band, bh3_out AS bh FROM $cur)",
      """cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM bk x JOIN bk y
        |    ON x.band = y.band AND x.bh = y.bh
        |    AND x.doc_id < y.doc_id)""".stripMargin)
    "WITH " + ctes.mkString(",\n") + "\nSELECT a, b FROM cand"
  }

  /** hashLong(col, literal seed) staged chain over CTE `src`, keys
    * carried; out = HUGEINT in [0, 2^64). */
  private def hashLongLit(tag: String, src: String, keys: Seq[String],
      elem: String, seed: Long, out: String): (Seq[String], String) = {
    val t = tag
    val ctes = Seq.newBuilder[String]
    var cur = src
    val base = keys.mkString(", ")
    def stage(sfx: String, expr: String, name: String): Unit = {
      val nm = s"${t}_$sfx"
      ctes += s"$nm AS MATERIALIZED (SELECT $base, $expr AS $name FROM $cur)"
      cur = nm
    }
    val eu = s"((CAST($elem AS HUGEINT) + $M64) & $MK64)"
    val k = mul64(rotl(mul64(eu, P2), 31), P1)
    val h0 = ((BigInt(seed) + P5 + 8) % M64).toString
    stage("h1", s"xor(($h0), $k)", s"${t}_h1")
    stage("h2", add64(mul64(rotl(s"${t}_h1", 27), P1), P4.toString), s"${t}_h2")
    stage("a1", s"xor(${t}_h2, ${t}_h2 >> 33)", s"${t}_a1")
    stage("a2", mul64(s"${t}_a1", P2), s"${t}_a2")
    stage("a3", s"xor(${t}_a2, ${t}_a2 >> 29)", s"${t}_a3")
    stage("a4", mul64(s"${t}_a3", P3), s"${t}_a4")
    stage("o", s"xor(${t}_a4, ${t}_a4 >> 32)", out)
    (ctes.result(), cur)
  }

  /** HyperBall replay (`reach_hll` / `eff_diameter` twins): per-node HLL
    * registers seeded from hashLong(id, 42) exactly as
    * [[graft.operators.GraphAlgos.neighborhoodFunction]] does (bucket =
    * low p bits, rho = 64−p+1 − bitlen of the remaining bits), registers
    * propagated by bounded-hop ball expansion + per-bucket MAX, and the
    * HLL read-out replayed with the SAME double constants and the SAME
    * register-ordered float fold (list_reduce over the ordered register
    * list — an unordered SUM of 2^-r terms can differ in the last ulp
    * and flip a round()). */
  private def hyperballCtes(maxHops: Int): (Seq[String], String) = {
    val m = 256
    val alpha = 0.7213 / (1 + 1.079 / m)
    val am2 = java.lang.Double.toString(alpha * m * m)
    val ctes = Seq.newBuilder[String]
    ctes += """g0 AS MATERIALIZED (SELECT DISTINCT
      |    least(l_partkey % 300, l_suppkey % 300) AS a,
      |    greatest(l_partkey % 300, l_suppkey % 300) AS b
      |  FROM lineitem
      |  WHERE least(l_partkey % 300, l_suppkey % 300)
      |      < greatest(l_partkey % 300, l_suppkey % 300)
      |    AND (least(l_partkey % 300, l_suppkey % 300) * 31
      |      + greatest(l_partkey % 300, l_suppkey % 300)) % 7 = 0)""".stripMargin
    ctes += ("e AS MATERIALIZED (SELECT a AS src, b AS dst FROM g0 " +
      "UNION SELECT b, a FROM g0)")
    ctes += ("nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM e " +
      "UNION SELECT dst FROM e)")
    val (hc, hf) = hashLongLit("nh", "nodes", Seq("id"), "id", 42L, "hu")
    hc.foreach(ctes += _)
    ctes += s"""reg AS MATERIALIZED (SELECT id, CAST(hu & 255 AS BIGINT) AS j,
      |  CAST(CASE WHEN (hu >> 8) = 0 THEN 57
      |       ELSE 57 - length(bin(hu >> 8)) END AS BIGINT) AS rho
      |  FROM $hf)""".stripMargin
    ctes += "b0 AS MATERIALIZED (SELECT id AS v, id AS u FROM nodes)"
    for (t <- 1 to maxHops)
      ctes += s"""b$t AS MATERIALIZED (
        |  SELECT DISTINCT v, u FROM (
        |    SELECT v, u FROM b${t - 1}
        |    UNION ALL
        |    SELECT p.v, e.dst AS u FROM b${t - 1} p JOIN e ON e.src = p.u) t)""".stripMargin
    val rows = (0 to maxHops).map { t =>
      ctes += s"""rr$t AS MATERIALIZED (
        |  SELECT p.v, r.j, MAX(r.rho) AS r FROM b$t p JOIN reg r ON r.id = p.u
        |  GROUP BY 1, 2)""".stripMargin
      ctes += s"""rl$t AS MATERIALIZED (
        |  SELECT n.id AS v,
        |    list(CAST(coalesce(rr.r, 0) AS DOUBLE) ORDER BY i.i) AS regs,
        |    SUM(CASE WHEN rr.r IS NULL THEN 1 ELSE 0 END) AS zeros
        |  FROM nodes n CROSS JOIN (SELECT unnest(range(0, 256)) AS i) i
        |  LEFT JOIN rr$t rr ON rr.v = n.id AND rr.j = i.i
        |  GROUP BY 1)""".stripMargin
      ctes += s"""est$t AS MATERIALIZED (
        |  SELECT v, CAST(round(CASE WHEN raw <= 640.0 AND zeros > 0
        |      THEN 256.0 * ln(256.0 / zeros) ELSE raw END) AS BIGINT) AS est
        |  FROM (SELECT v, zeros,
        |      $am2 / list_reduce(list_prepend(CAST(0.0 AS DOUBLE), regs),
        |        (acc, r) -> acc + pow(CAST(2.0 AS DOUBLE), -r)) AS raw
        |    FROM rl$t) q)""".stripMargin
      s"SELECT $t AS hop, COUNT(*) AS n_nodes, " +
        s"CAST(SUM(est) AS BIGINT) AS nf_est FROM est$t"
    }
    ctes += s"nf AS (${rows.mkString(" UNION ALL ")})"
    (ctes.result(), "nf")
  }

  def reachHllSql: String = {
    val (ctes, _) = hyperballCtes(maxHops = 3)
    "WITH " + ctes.mkString(",\n") + "\nSELECT hop, n_nodes, nf_est FROM nf"
  }

  def effDiameterSql: String = {
    val (ctes, _) = hyperballCtes(maxHops = 4)
    "WITH " + ctes.mkString(",\n") +
      """,
      |hz AS (SELECT MAX(nf_est) AS nf_max FROM nf)
      |SELECT MIN(hop) AS eff_diameter_hop, MAX(nf_max) AS nf_max
      |FROM nf, hz WHERE nf.nf_est * 10 >= hz.nf_max * 9""".stripMargin
  }
}
