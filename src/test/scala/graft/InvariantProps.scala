package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.refresh.{PriorityRefreshQueue, RefreshJob, RefreshScan, RefreshStatus, ThroughputAllocator}
import graft.streaming.{ExactlyOnce, KafkaTransport}

/** Property-based invariants over the pure control-plane kernels — the
  * pieces whose algebra must hold for EVERY input, not just the fixtures:
  * keyset tiling, throughput allocation, exactly-once reconciliation,
  * priority scheduling, offset-JSON encoding, DDL conversion. */
object InvariantProps extends Properties("graft.invariants") {

  // --- RefreshScan.keysetRanges: exact tiling of (min, max] -------------

  private val rangeGen = for {
    min <- Gen.chooseNum(-1000L, 1000L)
    span <- Gen.chooseNum(0L, 5000L)
    batch <- Gen.chooseNum(1L, 700L)
  } yield (min, min + span, batch)

  property("keysetRanges tile (min, max] with no gaps or overlaps") =
    forAll(rangeGen) { case (min, max, batch) =>
      val ranges = RefreshScan.keysetRanges(min, max, batch)
      val contiguous = ranges.zip(ranges.drop(1)).forall { case (a, b) => a._2 == b._1 }
      val bounded = ranges.forall { case (lo, hi) => lo >= min && hi <= max && lo < hi }
      val covers = if (min == max) ranges.isEmpty
        else ranges.headOption.contains((min, math.min(min + batch, max))) &&
          ranges.lastOption.exists(_._2 == max)
      contiguous && bounded && covers
    }

  property("keysetPredicates emits one predicate per range") =
    forAll(rangeGen) { case (min, max, batch) =>
      RefreshScan.keysetPredicates("pk", min, max, batch).length ==
        RefreshScan.keysetRanges(min, max, batch).length
    }

  // --- ThroughputAllocator ------------------------------------------------

  private val jobsGen: Gen[List[RefreshJob]] =
    Gen.listOf(for {
      id <- Gen.chooseNum(1, 100000)
      cap <- Gen.option(Gen.chooseNum(1, 400))
    } yield RefreshJob(id, "ns", s"src$id", RefreshStatus.NotStarted, 0L, 100,
      50, None, cap, id.toLong)).map(_.distinctBy(_.refreshId))

  property("allocator never exceeds a requested cap and keeps every job alive") =
    forAll(jobsGen, Gen.chooseNum(1, 2000)) { (jobs, total) =>
      val caps = ThroughputAllocator.allocate(jobs, total)
      jobs.forall { j =>
        val requested = j.avgRowsPerSecondCap.getOrElse(ThroughputAllocator.DefaultPerJobCap)
        caps(j.refreshId) >= 1 && caps(j.refreshId) <= requested
      }
    }

  property("allocator respects the fleet budget whenever the budget can fit the fleet") =
    forAll(jobsGen, Gen.chooseNum(1, 2000)) { (jobs, total) =>
      val caps = ThroughputAllocator.allocate(jobs, total)
      // with fewer jobs than budget units the scaled-down sum fits; a
      // fleet larger than the budget degrades to 1 row/s each (the
      // manager's concurrency limit keeps this from happening in practice)
      jobs.size > total || caps.values.sum <= total
    }

  // --- ExactlyOnce.reconcile ---------------------------------------------

  private val stateGen = for {
    saved <- Gen.chooseNum(0L, 10000L)
    delta <- Gen.chooseNum(-50L, 300L)
    replay <- Gen.chooseNum(0, 200)
  } yield (ExactlyOnce.TopicState(saved, saved + delta), replay)

  property("reconcile republishes iff the watermark sits inside the replay window") =
    forAll(stateGen) { case (st, replay) =>
      val already = st.highWatermark - st.savedOffset
      ExactlyOnce.reconcile(st, replay) match {
        case ExactlyOnce.RepublishFrom(i) =>
          already >= 0 && already <= replay && i == already
        case ExactlyOnce.Unensurable(a, r) =>
          (already < 0 || already > replay) && a == already && r == replay
      }
    }

  property("forced recovery always yields a full republish when unensurable") =
    forAll(stateGen) { case (st, replay) =>
      ExactlyOnce.reconcile(st, replay, allowForcedRecovery = true) match {
        case ExactlyOnce.RepublishFrom(i) => i >= 0 && i <= replay
        case _: ExactlyOnce.Unensurable => false
      }
    }

  // --- PriorityRefreshQueue.schedule ---------------------------------------

  private val queueGen: Gen[List[RefreshJob]] =
    Gen.listOf(for {
      id <- Gen.chooseNum(1, 100000)
      src <- Gen.oneOf("a", "b", "c")
      status <- Gen.oneOf(RefreshStatus.NotStarted, RefreshStatus.Paused,
        RefreshStatus.InProgress, RefreshStatus.Success)
      prio <- Gen.oneOf(25, 50, 75, 100)
      created <- Gen.chooseNum(0L, 1000L)
    } yield RefreshJob(id, "ns", src, status, 0L, 100, prio, None, None, created))
      .map(_.distinctBy(_.refreshId))

  property("schedule yields at most one queueable job per source, queue-ordered") =
    forAll(queueGen) { jobs =>
      val sched = PriorityRefreshQueue.schedule(jobs)
      val onePerSource = sched.groupBy(_.sourceName).values.forall(_.size == 1)
      val queueable = sched.forall(j =>
        j.status == RefreshStatus.Paused || j.status == RefreshStatus.NotStarted)
      val ordered = sched.zip(sched.drop(1)).forall { case (a, b) =>
        PriorityRefreshQueue.ordering.lteq(a, b)
      }
      onePerSource && queueable && ordered
    }

  // --- KafkaTransport.offsetsJson ------------------------------------------

  private val offsetsGen: Gen[Map[(String, Int), Long]] =
    Gen.mapOf(for {
      t <- Gen.oneOf("t1", "t2", "t3")
      p <- Gen.chooseNum(0, 8)
      o <- Gen.chooseNum(0L, 1000000L)
    } yield ((t, p), o))

  property("offsetsJson carries every topic, partition and offset") =
    forAll(offsetsGen) { offsets =>
      val json = KafkaTransport.offsetsJson(offsets)
      val balanced = json.count(_ == '{') == json.count(_ == '}')
      val allThere = offsets.forall { case ((t, p), o) =>
        json.contains(s""""$t"""") && json.contains(s""""$p": $o""")
      }
      balanced && allThere
    }

  // --- Uuid4Binary byte layout ---------------------------------------------

  property("uuid bytes round-trip the 128-bit value big-endian") =
    forAll { (m: Long, l: Long) =>
      val bytes = graft.functions.Uuid4Binary.toBytes(new java.util.UUID(m, l))
      val m2 = bytes.take(8).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
      val l2 = bytes.drop(8).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
      bytes.length == 16 && m2 == m && l2 == l
    }

  // --- DdlModel.splitColumns -------------------------------------------------

  private val colBodyGen: Gen[List[String]] = Gen.listOf(Gen.oneOf(
    "a INT NOT NULL", "b DECIMAL(10,2)", "c ENUM('x','y','z')",
    "d VARCHAR(64) DEFAULT 'q'", "PRIMARY KEY (a, b)"))

  property("splitColumns splits on top-level commas only") =
    forAll(colBodyGen) { cols =>
      val body = cols.mkString(", ")
      val got = graft.tools.DdlModel.splitColumns(body)
      got == cols.filter(_.nonEmpty)
    }

  // quote-hostile entries: commas/parens inside literals, '' and \'
  // escapes, backticked identifiers — the split must never cut inside
  // a literal regardless of how these are interleaved
  private val hostileColGen: Gen[List[String]] = Gen.listOf(Gen.oneOf(
    "a INT NOT NULL",
    "e ENUM('x,y','don''t','p(q') NOT NULL",
    """f VARCHAR(10) DEFAULT 'don\'t'""",
    """g VARCHAR(10) DEFAULT '(,'""",
    "`weird,name` INT",
    "h SET('a','b,c')",
    "PRIMARY KEY (a)"))

  property("splitColumns (mysql escapes) never cuts inside a literal") =
    forAll(hostileColGen) { cols =>
      val body = cols.mkString(", ")
      val got = graft.tools.DdlModel.splitColumns(body, backslashEscapes = true)
      got == cols.filter(_.nonEmpty)
    }

  // --- MysqlDdlConverter emits valid Avro ------------------------------------

  private val mysqlColsGen: Gen[List[(String, String)]] = Gen.nonEmptyListOf(for {
    n <- Gen.identifier.map(s => "c" + s.take(8))
    t <- Gen.oneOf("INT", "BIGINT UNSIGNED", "VARCHAR(32)", "TEXT", "TINYINT(1)",
      "DECIMAL(8,3)", "DATETIME", "DATE", "BLOB", "ENUM('a','b')", "JSON",
      "SMALLINT NOT NULL", "DOUBLE")
  } yield (n, t)).map(_.distinctBy(_._1))

  // --- NamespaceInfo ---------------------------------------------------------

  private val nsGen = for {
    env <- Gen.option(Gen.oneOf(graft.core.NamespaceInfo.KnownEnvironments.toSeq))
    cluster <- Gen.identifier.map("c" + _.take(6))
    db <- Gen.identifier.map("d" + _.take(6))
    sfx <- Gen.listOf(Gen.identifier.map("s" + _.take(4))).map(_.take(3))
  } yield graft.core.NamespaceInfo(env, cluster, db, sfx)

  property("namespace build/parse round-trips") = forAll(nsGen) { ns =>
    graft.core.NamespaceInfo.parse(ns.name) == ns
  }

  // --- SchemaRegistry replay determinism (what load() relies on) -------------

  private val schemaVariants = Vector(
    """{"type":"record","name":"r","namespace":"g","fields":[
        {"name":"f","type":"int","default":0}]}""",
    """{"type":"record","name":"r","namespace":"g","fields":[
        {"name":"f","type":"int","default":0},
        {"name":"g","type":"string","default":""}]}""",
    """{"type":"record","name":"r","namespace":"g","fields":[
        {"name":"f","type":"string"}]}""") // incompatible with the others

  private val registrationsGen: Gen[List[(String, String, Int, Boolean)]] =
    Gen.listOf(for {
      ns <- Gen.oneOf("ns1", "ns2")
      src <- Gen.oneOf("a", "b")
      v <- Gen.chooseNum(0, schemaVariants.size - 1)
      pii <- Gen.oneOf(true, false)
    } yield (ns, src, v, pii)).map(_.take(30))

  property("registration replay reproduces ids, topics and pii exactly") =
    forAll(registrationsGen) { regs =>
      def run() = {
        val reg = new graft.schema.SchemaRegistry
        regs.map { case (ns, src, v, pii) =>
          val e = reg.registerSchema(ns, src, schemaVariants(v), pii)
          (e.schemaId, e.topicId, e.topicName, e.containsPii)
        }
      }
      run() == run()
    }

  property("mysql CREATE TABLE parses to valid Avro with one field per column") = {
    forAll(mysqlColsGen) { cols =>
      val ddl = s"CREATE TABLE db.t (${cols.map { case (n, t) => s"`$n` $t" }.mkString(", ")})"
      val spec = graft.tools.MysqlDdlConverter.parse(ddl)
      val avro = new org.apache.avro.Schema.Parser().parse(spec.avroSchemaJson)
      Prop(avro.getFields.size == cols.size && spec.columns.size == cols.size)
    }
  }

  // --- DDL converters: type × nullability × default fuzz ----------------

  private final case class FuzzCol(name: String, ddlType: String,
      avro: String, spark: org.apache.spark.sql.types.DataType,
      notNull: Boolean, pk: Boolean, defaultIsNull: Boolean) {
    def nullable: Boolean = !notNull && !pk
    def render(q: String): String = {
      val nullSfx = if (notNull) " NOT NULL" else ""
      val pkSfx = if (pk) " PRIMARY KEY" else ""
      val defSfx = if (defaultIsNull) "" else " DEFAULT 0"
      s"$q$name$q $ddlType$nullSfx$defSfx$pkSfx"
    }
  }

  private def ddlColsGen(
      pool: Seq[(String, String, org.apache.spark.sql.types.DataType)])
      : Gen[List[FuzzCol]] =
    Gen.nonEmptyListOf(for {
      n <- Gen.identifier.map(s => "c" + s.take(8).toLowerCase)
      (t, a, sp) <- Gen.oneOf(pool)
      notNull <- Gen.oneOf(true, false)
      pk <- Gen.frequency(9 -> Gen.const(false), 1 -> Gen.const(true))
      defNull <- Gen.oneOf(true, false)
    } yield FuzzCol(n, t, a, sp, notNull, pk, defNull))
      .map(_.distinctBy(_.name))
      // at most one inline PRIMARY KEY, like real DDL
      .map { cols =>
        var seen = false
        cols.map { c =>
          val keep = c.pk && !seen
          if (c.pk) seen = true
          c.copy(pk = keep)
        }
      }

  private val mysqlPool = Seq(
    ("TINYINT(1)", "boolean", org.apache.spark.sql.types.BooleanType),
    ("BOOLEAN", "boolean", org.apache.spark.sql.types.BooleanType),
    ("TINYINT", "int", org.apache.spark.sql.types.IntegerType),
    ("SMALLINT", "int", org.apache.spark.sql.types.IntegerType),
    ("MEDIUMINT", "int", org.apache.spark.sql.types.IntegerType),
    ("INT", "int", org.apache.spark.sql.types.IntegerType),
    ("INT UNSIGNED", "long", org.apache.spark.sql.types.LongType),
    ("BIGINT", "long", org.apache.spark.sql.types.LongType),
    ("BIGINT UNSIGNED", "long", org.apache.spark.sql.types.LongType),
    ("FLOAT", "float", org.apache.spark.sql.types.FloatType),
    ("DOUBLE", "double", org.apache.spark.sql.types.DoubleType),
    ("DECIMAL(8,3)", "double", org.apache.spark.sql.types.DecimalType(8, 3)),
    ("CHAR(4)", "string", org.apache.spark.sql.types.StringType),
    ("VARCHAR(32)", "string", org.apache.spark.sql.types.StringType),
    ("TEXT", "string", org.apache.spark.sql.types.StringType),
    ("BINARY(8)", "bytes", org.apache.spark.sql.types.BinaryType),
    ("VARBINARY(16)", "bytes", org.apache.spark.sql.types.BinaryType),
    ("BLOB", "bytes", org.apache.spark.sql.types.BinaryType),
    ("DATE", "long", org.apache.spark.sql.types.DateType),
    ("DATETIME", "long", org.apache.spark.sql.types.TimestampType),
    ("TIMESTAMP", "long", org.apache.spark.sql.types.TimestampType),
    ("TIME", "long", org.apache.spark.sql.types.LongType),
    ("YEAR", "int", org.apache.spark.sql.types.IntegerType),
    ("ENUM('a','b')", "string", org.apache.spark.sql.types.StringType),
    ("SET('x','y')", "string", org.apache.spark.sql.types.StringType),
    ("JSON", "string", org.apache.spark.sql.types.StringType))

  private val redshiftPool = Seq(
    ("SMALLINT", "int", org.apache.spark.sql.types.ShortType),
    ("INT2", "int", org.apache.spark.sql.types.ShortType),
    ("INTEGER", "int", org.apache.spark.sql.types.IntegerType),
    ("INT", "int", org.apache.spark.sql.types.IntegerType),
    ("BIGINT", "long", org.apache.spark.sql.types.LongType),
    ("REAL", "float", org.apache.spark.sql.types.FloatType),
    ("FLOAT8", "double", org.apache.spark.sql.types.DoubleType),
    ("BOOLEAN", "boolean", org.apache.spark.sql.types.BooleanType),
    ("DECIMAL(10,2)", "double", org.apache.spark.sql.types.DecimalType(10, 2)),
    ("VARCHAR(64)", "string", org.apache.spark.sql.types.StringType),
    ("TEXT", "string", org.apache.spark.sql.types.StringType),
    ("CHAR(3)", "string", org.apache.spark.sql.types.StringType),
    ("TIMESTAMP", "long", org.apache.spark.sql.types.TimestampType),
    ("DATE", "long", org.apache.spark.sql.types.DateType))

  /** The full convert → Avro-parse → StructType round-trip contract for
    * one generated table: field totals and order, the per-column Avro
    * base type, union-iff-nullable with the default-driven branch order,
    * the `default: null` attribute exactly when it is renderable, and
    * the Spark nullability + type the registry's readers see. */
  private def ddlRoundTrip(spec: graft.tools.DdlModel.TableSpec,
                           cols: List[FuzzCol]): Prop = {
    val avro = new org.apache.avro.Schema.Parser().parse(spec.avroSchemaJson)
    val st = spec.structType
    val totals = Prop(avro.getFields.size == cols.size &&
      spec.columns.size == cols.size && st.size == cols.size) :| "field totals"
    val names = Prop(spec.columns.map(_.name) == cols.map(_.name) &&
      st.fields.map(_.name).toSeq == cols.map(_.name)) :| "name order"
    val perCol = Prop.all(cols.zipWithIndex.map { case (c, i) =>
      val f = avro.getFields.get(i)
      val s = f.schema()
      val unionOk =
        if (!c.nullable) s.getType != org.apache.avro.Schema.Type.UNION &&
          s.getType.getName == c.avro
        else {
          val branches = s.getTypes
          s.getType == org.apache.avro.Schema.Type.UNION &&
            branches.size == 2 &&
            (if (c.defaultIsNull)
              branches.get(0).getType.getName == "null" &&
                branches.get(1).getType.getName == c.avro
            else
              branches.get(0).getType.getName == c.avro &&
                branches.get(1).getType.getName == "null")
        }
      val defaultOk = f.hasDefaultValue == (c.nullable && c.defaultIsNull)
      val sparkOk = st.fields(i).nullable == c.nullable &&
        st.fields(i).dataType == c.spark
      Prop(unionOk && defaultOk && sparkOk) :|
        s"column ${c.name} (${c.ddlType} notNull=${c.notNull} pk=${c.pk} " +
          s"defNull=${c.defaultIsNull}): avro=$s spark=${st.fields(i)}"
    }: _*)
    totals && names && perCol
  }

  property("mysql DDL fuzz: convert → Avro → StructType round-trips types, nullability, defaults") =
    forAll(ddlColsGen(mysqlPool)) { cols =>
      val ddl = s"CREATE TABLE db.t (${cols.map(_.render("`")).mkString(", ")})"
      ddlRoundTrip(graft.tools.MysqlDdlConverter.parse(ddl), cols)
    }

  property("redshift DDL fuzz: convert → Avro → StructType round-trips types, nullability, defaults") =
    forAll(ddlColsGen(redshiftPool)) { cols =>
      val ddl = s"""CREATE TABLE public.t (${cols.map(_.render("\"")).mkString(", ")})"""
      ddlRoundTrip(graft.tools.RedshiftDdlConverter.parse(ddl), cols)
    }

  // --- ALTER TABLE fuzz: applyAlter tracks a driver-side column model --

  private sealed trait AlterOp
  private final case class AddCol(c: FuzzCol) extends AlterOp
  private final case class DropCol(ix: Int) extends AlterOp
  private final case class ModifyCol(ix: Int, t: String, a: String,
      sp: org.apache.spark.sql.types.DataType) extends AlterOp
  private final case class ChangeCol(ix: Int, newName: String, t: String,
      a: String, sp: org.apache.spark.sql.types.DataType) extends AlterOp

  private val alterOpsGen: Gen[(List[FuzzCol], List[AlterOp])] = for {
    base <- ddlColsGen(mysqlPool).suchThat(_.nonEmpty)
    nOps <- Gen.chooseNum(1, 5)
    ops <- Gen.listOfN(nOps, for {
      kind <- Gen.chooseNum(0, 3)
      ix <- Gen.chooseNum(0, 100)
      (t, a, sp) <- Gen.oneOf(mysqlPool)
      nn <- Gen.identifier.map(s => "z" + s.take(8).toLowerCase)
      add <- ddlColsGen(mysqlPool).map(_.head)
    } yield kind match {
      case 0 => AddCol(add)
      case 1 => DropCol(ix)
      case 2 => ModifyCol(ix, t, a, sp)
      case _ => ChangeCol(ix, nn, t, a, sp)
    })
  } yield (base, ops)

  property("mysql applyAlter tracks add/drop/modify/change against a reference model") =
    forAll(alterOpsGen) { case (base, ops) =>
      // reference model: (name, avroType, nullable) triples, evolved in
      // plain Scala next to the DDL statements we feed the converter
      var model = base.map(c => (c.name, c.avro, c.nullable))
      val clauses = scala.collection.mutable.ArrayBuffer.empty[String]
      ops.foreach {
        case AddCol(c) if !model.exists(_._1 == c.name) =>
          clauses += s"ADD COLUMN ${c.render("`")}"
          model = model :+ ((c.name, c.avro, c.nullable))
        case DropCol(ix) if model.size > 1 =>
          val name = model(ix % model.size)._1
          clauses += s"DROP COLUMN `$name`"
          model = model.filterNot(_._1 == name)
        case ModifyCol(ix, t, a, sp) if model.nonEmpty =>
          val name = model(ix % model.size)._1
          clauses += s"MODIFY COLUMN `$name` $t"
          model = model.map(m => if (m._1 == name) (name, a, true) else m)
        case ChangeCol(ix, nn, t, a, sp)
            if model.nonEmpty && !model.exists(_._1 == nn) =>
          val name = model(ix % model.size)._1
          clauses += s"CHANGE COLUMN `$name` `$nn` $t"
          model = model.map(m => if (m._1 == name) (nn, a, true) else m)
        case _ => () // skip ops that would be invalid DDL (dup name, last col)
      }
      val ddl = s"CREATE TABLE db.t (${base.map(_.render("`")).mkString(", ")})"
      val parsed = graft.tools.MysqlDdlConverter.parse(ddl)
      val evolved =
        if (clauses.isEmpty) parsed
        else graft.tools.MysqlDdlConverter.applyAlter(parsed,
          s"ALTER TABLE db.t ${clauses.mkString(", ")}")
      val got = evolved.columns.map(c => (c.name, c.avroType, c.nullable))
      Prop(got == model) :|
        s"model=$model got=$got clauses=${clauses.toList}"
    }

  // --- PassJoin pigeonhole: NO false negatives, for any edit script ----

  private def passKeys(s: String, d: Int, probe: Boolean): Set[String] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    graft.functions.PassJoinKeys(Literal.create(s, StringType), d, probe)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](StringType)
      .map(_.toString).toSet
  }

  private val editedPairGen: Gen[(String, String, Int)] = for {
    d <- Gen.chooseNum(1, 3)
    len <- Gen.chooseNum(0, 12)
    a <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    nEdits <- Gen.chooseNum(0, d)
    edits <- Gen.listOfN(nEdits, Gen.zip(Gen.chooseNum(0, 2),
      Gen.chooseNum(0, 1000), Gen.oneOf('a', 'b', 'c')))
  } yield {
    // apply ≤ d random edits, so lev(a, b) ≤ d by construction
    val b = edits.foldLeft(a) { case (s, (kind, pos, ch)) =>
      kind match {
        case 0 => // insert
          val p = if (s.isEmpty) 0 else pos % (s.length + 1)
          s.substring(0, p) + ch + s.substring(p)
        case 1 if s.nonEmpty => // delete
          val p = pos % s.length
          s.substring(0, p) + s.substring(p + 1)
        case 2 if s.nonEmpty => // substitute
          val p = pos % s.length
          s.substring(0, p) + ch + s.substring(p + 1)
        case _ => s
      }
    }
    (a, b, d)
  }

  property("PassJoin keys: any pair within edit distance d collides on >= 1 (index, probe) key") =
    forAll(editedPairGen) { case (a, b, d) =>
      // the shorter side plays the index role (its own d+1 segments);
      // the longer side probes — exactly the join in editDistancePairs
      val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
      val hit = passKeys(s, d, probe = false)
        .intersect(passKeys(l, d, probe = true)).nonEmpty
      Prop(hit) :| s"no key collision for ('$s', '$l') at d=$d"
    }

  // --- hashed-classifier pseudo-weights: bounded, deterministic, u24 ----

  property("pseudoWeights lie in [-1000, 1000], replay the md5-u24 draw, and are stable") =
    forAll(Gen.alphaNumStr.map(_.take(8)), Gen.chooseNum(1, 512)) { (salt, nb) =>
      val w = graft.operators.TextAnalysis.pseudoWeights(salt, nb)
      def u24(s: String): Long = {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).take(3).map(b => f"$b%02x").mkString
        java.lang.Long.parseLong(hex, 16)
      }
      Prop(w.length == nb) &&
        Prop(w.forall(x => x >= -1000 && x <= 1000)) &&
        Prop(w.zipWithIndex.forall { case (x, b) =>
          x == (u24(s"$salt$b") % 2001L).toInt - 1000
        }) &&
        Prop(w.sameElements(graft.operators.TextAnalysis.pseudoWeights(salt, nb)))
    }

  // --- PqAdc lookup-sum: reference equality + invalid-code null ---------

  private def arr(xs: Seq[Any]): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(xs.toArray)

  private val adcGen = for {
    m <- Gen.chooseNum(1, 6)
    ksub <- Gen.chooseNum(1, 8)
    ids <- Gen.sequence[Seq[Seq[Int]], Seq[Int]](
      Seq.fill(m)(Gen.pick(ksub, 0 until 16).map(_.toSeq.sorted)))
    codes <- Gen.sequence[Seq[Int], Int](Seq.fill(m)(Gen.chooseNum(0, 17)))
    tbl <- Gen.sequence[Seq[Seq[Double]], Seq[Double]](
      Seq.fill(m)(Gen.sequence[Seq[Double], Double](
        Seq.fill(ksub)(Gen.chooseNum(0, 999999).map(_ / 1e6)))))
  } yield (ids.map(_.toArray).toArray, codes, tbl)

  property("pq_adc equals the map-lookup reference; unresolvable codes are null") =
    forAll(adcGen) { case (ids, codes, tbl) =>
      val e = graft.functions.PqAdc(
        org.apache.spark.sql.catalyst.expressions.Literal(null),
        org.apache.spark.sql.catalyst.expressions.Literal(null), ids)
      val got = e.compute(arr(codes), arr(tbl.map(r => arr(r))))
      val ref: Option[Double] = {
        val terms = ids.indices.map { j =>
          val pos = ids(j).indexOf(codes(j))
          if (pos < 0) None else Some(tbl(j)(pos))
        }
        if (terms.exists(_.isEmpty)) None
        else Some(java.math.BigDecimal.valueOf(terms.flatten.sum)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
      }
      Prop(Option(got).map(_.asInstanceOf[Double]) == ref)
    }

  // --- MmrSelect: algebraic invariants of the greedy cut ----------------

  private val mmrGen = for {
    k <- Gen.chooseNum(1, 10)
    dim <- Gen.chooseNum(1, 4)
    ids <- Gen.pick(k, 0L until 40L).map(_.toSeq)
    rels <- Gen.sequence[Seq[Long], Long](Seq.fill(k)(Gen.chooseNum(0L, 1000000L)))
    vecs <- Gen.sequence[Seq[Seq[Double]], Seq[Double]](
      Seq.fill(k)(Gen.sequence[Seq[Double], Double](
        Seq.fill(dim)(Gen.chooseNum(-100, 100).map(_ / 10.0)))))
      .suchThat(_.forall(v => v.exists(_ != 0.0)))
    n <- Gen.chooseNum(1, 12)
    lam <- Gen.chooseNum(0L, 1000000L)
  } yield (ids, rels, vecs, n, lam)

  private def mmrRun(ids: Seq[Long], rels: Seq[Long], vecs: Seq[Seq[Double]],
                     n: Int, lam: Long): Seq[Long] = {
    val e = graft.functions.MmrSelect(
      org.apache.spark.sql.catalyst.expressions.Literal(null),
      org.apache.spark.sql.catalyst.expressions.Literal(null),
      org.apache.spark.sql.catalyst.expressions.Literal(null), n, lam)
    e.compute(arr(ids), arr(rels), arr(vecs.map(v => arr(v))))
      .toLongArray().toSeq
  }

  property("mmr_select picks min(n, k) DISTINCT input ids, permutation-invariant") =
    forAll(mmrGen) { case (ids, rels, vecs, n, lam) =>
      val out = mmrRun(ids, rels, vecs, n, lam)
      val perm = scala.util.Random.shuffle(ids.indices.toList)
      val out2 = mmrRun(perm.map(ids), perm.map(rels), perm.map(vecs), n, lam)
      Prop(out.length == math.min(n, ids.length)) &&
        Prop(out.distinct == out) &&
        Prop(out.forall(ids.contains)) &&
        Prop(out2 == out)
    }

  property("mmr_select at λ=1 is the pure relevance order (rel desc, id asc)") =
    forAll(mmrGen) { case (ids, rels, vecs, n, _) =>
      val out = mmrRun(ids, rels, vecs, n, 1000000L)
      val expected = ids.zip(rels).sortBy { case (id, r) => (-r, id) }
        .map(_._1).take(math.min(n, ids.length))
      Prop(out == expected)
    }
}
