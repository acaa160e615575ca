package graft

import org.apache.spark.sql.functions._
import graft.pipeline._
import graft.sources.Tables
import graft.util.Skew

class PipelineSpec extends SparkSpec {

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_p").toString

  test("selectors.yml: named selectors parse and evaluate union/" +
       "intersection/exclude/closure criteria against the DAG") {
    val dag = new Pipeline(Seq(
      Model("a", Seq("src"), EphemeralMat, in => in("src"), tags = Seq("daily")),
      Model("b", Seq("a"), EphemeralMat, in => in("a"), tags = Seq("daily")),
      Model("c", Seq("b"), EphemeralMat, in => in("b")),
      Model("d", Seq("a"), EphemeralMat, in => in("a"), tags = Seq("nightly"))))
    val defs = ProjectYaml.loadSelectors(
      """selectors:
        |  - name: daily_children
        |    description: daily models and everything under them, minus c
        |    default: true
        |    definition:
        |      union:
        |        - method: tag
        |          value: daily
        |          children: true
        |        - d
        |        - exclude:
        |            - c
        |  - name: upstream_of_c
        |    definition:
        |      intersection:
        |        - "+c"
        |        - "tag:daily"
        |""".stripMargin)
    assert(defs.map(_.name) == Seq("daily_children", "upstream_of_c"))
    assert(defs.head.isDefault && !defs(1).isDefault)
    // union of (daily ∪ downstream) with d, minus the exclude
    assert(dag.evalSelector(defs.head.definition) == Seq("a", "b", "d"))
    // + prefix = upstream closure; intersection with the tag set
    assert(dag.evalSelector(defs(1).definition) == Seq("a", "b"))
    // glob fqn + suffix closure shorthand
    assert(dag.evalSelector("b+") == Seq("b", "c"))
    // state:modified without a prior manifest refuses instead of
    // silently selecting nothing
    val e = intercept[IllegalArgumentException](
      dag.evalSelector("state:modified+"))
    assert(e.getMessage.contains("manifest"))
    // unknown methods refuse
    assert(intercept[IllegalArgumentException](
      dag.evalSelector("path:models/staging"))
      .getMessage.contains("unsupported method"))
    // two defaults refuse at load
    assert(intercept[IllegalArgumentException](ProjectYaml.loadSelectors(
      """selectors:
        |  - name: s1
        |    default: true
        |    definition: a
        |  - name: s2
        |    default: true
        |    definition: b
        |""".stripMargin)).getMessage.contains("default"))
    // dbt run --selector: the named (or default) selection actually runs
    import spark.implicits._
    val src = Seq((1L, 2L)).toDF("k", "v")
    val out = dag.runSelector(spark, Map("src" -> src),
      java.nio.file.Files.createTempDirectory("graft_sel").toString, defs)
    // default selector picked {a,b,d}; ephemeral models resolve lazily,
    // so the run surface is exactly the selection + upstream closure
    assert(out.keySet - "src" == Set("a", "b", "d"))
    assert(intercept[IllegalArgumentException](
      dag.runSelector(spark, Map("src" -> src), "/tmp/x", defs,
        Some("nope"))).getMessage.contains("unknown selector"))
  }

  test("column-level lineage traces expressions through project/agg/" +
       "window/explode/union; untouched attrs pass through joins") {
    import spark.implicits._
    val dag = new Pipeline(Seq(
      Model("a", Seq("src"), EphemeralMat, in => in("src")
        .select((col("u") + col("v")).as("x"), col("u").as("y"),
          col("tags"))),
      Model("b", Seq("a", "dim"), EphemeralMat, in =>
        in("a").join(in("dim"), in("a")("y") === in("dim")("k"))
          .select(col("x"), col("label"),
            explode(col("tags")).as("tag"))),
      Model("c", Seq("b"), EphemeralMat, in => in("b")
        .groupBy("label")
        .agg(sum("x").as("sx"), count(lit(1)).as("n")))))
    val src = Seq((1L, 2L, Seq("t"))).toDF("u", "v", "tags")
    val dim = Seq((1L, "L")).toDF("k", "label")
    val lin = dag.columnLineage(spark, Map("src" -> src, "dim" -> dim))
    assert(lin("a") == Map(
      "x" -> Seq("src.u", "src.v"), "y" -> Seq("src.u"),
      "tags" -> Seq("src.tags")))
    assert(lin("b") == Map(
      "x" -> Seq("a.x"), "label" -> Seq("dim.label"),
      "tag" -> Seq("a.tags")))
    assert(lin("c") == Map(
      "label" -> Seq("b.label"), "sx" -> Seq("b.x"), "n" -> Nil))
  }

  test("groups + access: a private model refuses refs from other groups " +
       "at construction; same-group and public refs pass") {
    def mk(depAccess: String, depGroup: Option[String],
           refGroup: Option[String]) = new Pipeline(Seq(
      Model("core", Seq("src"), EphemeralMat, in => in("src"),
        group = depGroup, access = depAccess),
      Model("mart", Seq("core"), EphemeralMat, in => in("core"),
        group = refGroup)))
    mk("private", Some("plat"), Some("plat")) // same group: fine
    mk("public", Some("plat"), Some("finance")) // public: fine
    mk("protected", Some("plat"), Some("finance")) // same package: fine
    val e = intercept[IllegalArgumentException](
      mk("private", Some("plat"), Some("finance")))
    assert(e.getMessage.contains("private model 'core'"))
    assert(intercept[IllegalArgumentException](mk("internal", None, None))
      .getMessage.contains("unknown access"))
    // access/group are manifest-visible → state:modified picks up changes
    val man = mk("private", Some("plat"), Some("plat")).manifestJson(Map.empty)
    assert(man.contains(""""access":"private"""") &&
      man.contains(""""group":"plat""""))
  }

  test("pipeline resolves refs in topological order and detects cycles") {
    val dag = new Pipeline(Seq(
      Model("c", Seq("b"), EphemeralMat, in => in("b")),
      Model("a", Seq("src"), EphemeralMat, in => in("src")),
      Model("b", Seq("a"), EphemeralMat, in => in("a"))))
    assert(dag.topoOrder(Set("src")).map(_.name) == Seq("b", "a", "c").sorted
      .sortBy(Seq("a", "b", "c").indexOf(_)))
    val cyclic = new Pipeline(Seq(
      Model("x", Seq("y"), EphemeralMat, in => in("y")),
      Model("y", Seq("x"), EphemeralMat, in => in("x"))))
    val e = intercept[IllegalArgumentException](cyclic.topoOrder(Set()))
    assert(e.getMessage.contains("cycle"))
    val missing = new Pipeline(Seq(Model("z", Seq("nope"), EphemeralMat, in => in("nope"))))
    assert(intercept[IllegalArgumentException](missing.topoOrder(Set()))
      .getMessage.contains("unresolved"))
  }

  test("view materialization registers a queryable temp view") {
    val dag = new Pipeline(Seq(
      Model("stg_orders_v", Seq("orders"), ViewMat,
        in => in("orders").select(col("o_orderkey"), col("o_totalprice")))))
    dag.run(spark, Map("orders" -> Tables.orders(spark, sf)), tmp())
    assert(spark.sql("SELECT count(*) FROM stg_orders_v").head.getLong(0) ==
      Tables.orders(spark, sf).count())
  }

  test("incremental materialization: rerun is idempotent, delta wins") {
    val dir = tmp()
    val orders = Tables.orders(spark, sf)
    def dag(price: Double) = new Pipeline(Seq(
      Model("inc", Seq("orders"), IncrementalMat("o_orderkey"),
        in => in("orders").select(col("o_orderkey"), lit(price).as("p")))))
    val first = dag(1.0).run(spark, Map("orders" -> orders), dir)("inc")
    assert(first.count() == orders.count())
    val second = dag(2.0).run(spark, Map("orders" -> orders), dir)("inc")
    assert(second.count() == orders.count(), "incremental rerun duplicated rows")
    assert(second.agg(min("p")).head.getDouble(0) == 2.0, "delta did not win")
  }

  test("table materialization writes partitioned layout") {
    val dir = tmp()
    val dag = new Pipeline(Seq(
      Model("t", Seq("orders"), TableMat(Some("o_orderstatus"), Seq("o_orderkey")),
        in => in("orders").select(col("o_orderkey"), col("o_orderstatus")))))
    dag.run(spark, Map("orders" -> Tables.orders(spark, sf)), dir)
    val parts = new java.io.File(s"$dir/t").listFiles()
      .map(_.getName).filter(_.startsWith("o_orderstatus=")).toSet
    assert(parts == Set("o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"))
  }

  test("selectUpstream pulls transitive deps; runSubset skips unselected models") {
    val dag = new Pipeline(Seq(
      Model("a", Seq("src"), EphemeralMat, in => in("src")),
      Model("b", Seq("a"), EphemeralMat, in => in("a")),
      Model("c", Seq("b"), EphemeralMat, in => in("b")),
      Model("d", Seq("src"), EphemeralMat, in => in("src"))))
    assert(dag.selectUpstream(Seq("c")) == Seq("a", "b", "c"))
    assert(dag.lineage.toSet ==
      Set("a" -> "src", "b" -> "a", "c" -> "b", "d" -> "src"))
    val out = dag.runSubset(spark,
      Map("src" -> Tables.orders(spark, sf).limit(1)), tmp(), Seq("c"))
    assert(out.contains("c") && !out.contains("d"))
  }

  test("multimodal resize: aspect preserved, bounded by target box") {
    val feats = graft.operators.Multimodal.extractFeatures(Tables.documents(spark, sf))
    val resized = graft.operators.Multimodal.resizeTo(feats, 100, 100).collect()
    resized.foreach { r =>
      val (w, h, ow, oh, s) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getFloat(5))
      assert(ow <= 100 && oh <= 100)
      assert(s <= 1.0f)
      // aspect ratio within 5% relative (integer rounding at small dims)
      val (orig, out) = (w.toDouble / h, ow.toDouble / oh)
      assert(math.abs(out - orig) / orig < 0.05,
        s"aspect drift: ${w}x$h -> ${ow}x$oh")
    }
  }

  test("model unit test: mocked inputs diffed against expected rows") {
    import spark.implicits._
    val bucketModel = Model("fct", Seq("src"), EphemeralMat, in =>
      in("src").select(col("id"),
        when(col("v") > 100, "high").otherwise("regular").as("bucket")))
    val mocked = Map("src" -> Seq((1L, 50.0), (2L, 150.0)).toDF("id", "v"))
    val good = Seq((1L, "regular"), (2L, "high")).toDF("id", "bucket")
    assert(ModelTest.run(bucketModel, mocked, good).isEmpty)
    val bad = Seq((1L, "high"), (2L, "high")).toDF("id", "bucket")
    val err = ModelTest.run(bucketModel, mocked, bad)
    assert(err.exists(_.contains("1 unexpected row(s), 1 missing row(s)")))
  }

  test("run hooks fire in order: start, before/after each model (topo), end") {
    val events = scala.collection.mutable.ArrayBuffer[String]()
    val dag = new Pipeline(Seq(
      Model("b", Seq("a"), EphemeralMat, in => in("a")),
      Model("a", Seq("src"), EphemeralMat, in => in("src"))))
    val hooks = RunHooks(
      onRunStart = ms => events += s"start:${ms.map(_.name).mkString(",")}",
      onRunEnd = out => events += s"end:${out.keys.toSeq.sorted.mkString(",")}",
      beforeModel = m => events += s"before:${m.name}",
      afterModel = (m, df) => events += s"after:${m.name}:${df.count()}")
    val src = Tables.orders(spark, sf).limit(3)
    dag.run(spark, Map("src" -> src), tmp(), hooks)
    assert(events.toSeq == Seq(
      "start:a,b", "before:a", "after:a:3", "before:b", "after:b:3",
      "end:a,b,src"))
  }

  test("full refresh rebuilds an incremental table from scratch") {
    val dir = tmp()
    val orders = Tables.orders(spark, sf)
    // orderBy+limit so dag(10).keys ⊆ dag(100).keys deterministically
    def dag(n: Int, p: Double) = new Pipeline(Seq(
      Model("inc", Seq("orders"), IncrementalMat("o_orderkey"),
        in => in("orders").orderBy("o_orderkey").limit(n)
          .select(col("o_orderkey"), lit(p).as("p")))))
    dag(100, 1.0).run(spark, Map("orders" -> orders), dir)
    // normal incremental run: old keys survive, so count stays 100
    val merged = dag(10, 2.0).run(spark, Map("orders" -> orders), dir)("inc")
    assert(merged.count() == 100)
    // --full-refresh: table is exactly the delta, old rows discarded
    val fresh = dag(10, 3.0).run(spark, Map("orders" -> orders), dir,
      fullRefresh = true)("inc")
    assert(fresh.count() == 10, "full refresh kept stale base rows")
    assert(fresh.agg(min("p")).head.getDouble(0) == 3.0)
  }

  test("on_schema_change policies: ignore / append / sync / fail") {
    import graft.operators.OnSchemaChange
    import spark.implicits._
    val base = Seq((1L, "a", 10.0)).toDF("id", "s", "v")
    val delta = Seq((2L, 20.0, true)).toDF("id", "v", "extra") // drops s, adds extra
    val (bi, di) = OnSchemaChange.align(base, delta, OnSchemaChange.Ignore)
    assert(bi.columns.toSeq == Seq("id", "s", "v") &&
           di.columns.toSeq == Seq("id", "s", "v"))
    assert(di.head.getAs[Any]("s") == null, "ignore must null the dropped column")
    val (ba, da) = OnSchemaChange.align(base, delta, OnSchemaChange.AppendNewColumns)
    assert(ba.columns.toSeq == Seq("id", "s", "v", "extra") &&
           da.columns.toSeq == Seq("id", "s", "v", "extra"))
    assert(ba.head.getAs[Any]("extra") == null)
    val (bs, ds) = OnSchemaChange.align(base, delta, OnSchemaChange.SyncAllColumns)
    assert(bs.columns.toSeq == Seq("id", "v", "extra") &&
           ds.columns.toSeq == Seq("id", "v", "extra"))
    assert(bs.head.getAs[Any]("extra") == null)
    intercept[IllegalStateException](
      OnSchemaChange.align(base, delta, OnSchemaChange.Fail))
    // identical schemas pass under fail
    val (_, dOk) = OnSchemaChange.align(base, base, OnSchemaChange.Fail)
    assert(dOk.columns.toSeq == base.columns.toSeq)
  }

  test("incremental sync_all_columns: second run's schema replaces the table's") {
    import graft.operators.OnSchemaChange
    val dir = tmp()
    val orders = Tables.orders(spark, sf)
    def dag(build: Map[String, org.apache.spark.sql.DataFrame] => org.apache.spark.sql.DataFrame) =
      new Pipeline(Seq(Model("inc", Seq("orders"),
        IncrementalMat("o_orderkey", OnSchemaChange.SyncAllColumns), build)))
    dag(in => in("orders").select(col("o_orderkey"), col("o_orderstatus")))
      .run(spark, Map("orders" -> orders), dir)
    val out = dag(in => in("orders").limit(10)
        .select(col("o_orderkey"), col("o_totalprice")))
      .run(spark, Map("orders" -> orders), dir)("inc")
    // status dropped, totalprice added; base rows carry NULL totalprice
    assert(out.columns.toSeq == Seq("o_orderkey", "o_totalprice"))
    assert(out.count() == orders.count())
    assert(out.filter(col("o_totalprice").isNull).count() == orders.count() - 10)
  }

  test("docs artifacts: manifest deps mirror lineage, catalog columns mirror schemas") {
    val dag = new Pipeline(Seq(
      Model("stg", Seq("orders"), ViewMat,
        in => in("orders").select(col("o_orderkey"), col("o_totalprice")),
        description = "staging view over raw orders",
        columnDocs = Map("o_orderkey" -> "natural order key")),
      Model("fct", Seq("stg"), IncrementalMat("o_orderkey"), in => in("stg"))))
    val resolved = dag.run(spark,
      Map("orders" -> Tables.orders(spark, sf).limit(5)), tmp())
    val dir = tmp()
    dag.writeDocs(dir, resolved)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val man = om.readTree(new java.io.File(s"$dir/manifest.json"))
    val nodes = man.get("nodes")
    assert(nodes.has("model.graft.stg") && nodes.has("model.graft.fct"))
    assert(man.get("sources").has("source.graft.orders"))
    assert(nodes.get("model.graft.fct").get("depends_on").get("nodes")
      .get(0).asText == "model.graft.stg")
    val cfg = nodes.get("model.graft.fct").get("config")
    assert(cfg.get("materialized").asText == "incremental")
    assert(cfg.get("unique_key").asText == "o_orderkey")
    assert(cfg.get("on_schema_change").asText == "append_new_columns")
    // persist_docs: relation + column descriptions flow into the manifest
    val stg = nodes.get("model.graft.stg")
    assert(stg.get("description").asText == "staging view over raw orders")
    assert(stg.get("columns").get("o_orderkey").get("description")
      .asText == "natural order key")
    dag.lineage.foreach { case (m, d) =>
      val arr = man.get("parent_map").get(s"model.graft.$m")
      assert((0 until arr.size).exists(i => arr.get(i).asText.endsWith("." + d)),
        s"parent_map missing $m -> $d")
    }
    val cat = om.readTree(new java.io.File(s"$dir/catalog.json"))
    val stgCols = cat.get("nodes").get("model.graft.stg").get("columns")
    assert(resolved("stg").schema.fieldNames.forall(stgCols.has))
    assert(stgCols.get("o_orderkey").get("type").asText == "bigint")
    assert(stgCols.get("o_totalprice").get("index").asInt == 1)
  }

  test("exposures land in the manifest; tag selection picks tagged models only") {
    val dag = new Pipeline(Seq(
      Model("a", Seq("src"), EphemeralMat, in => in("src"), tags = Seq("nightly")),
      Model("b", Seq("a"), EphemeralMat, in => in("a")),
      Model("c", Seq("b"), EphemeralMat, in => in("b"), tags = Seq("nightly"))),
      exposures = Seq(Exposure("exec_dashboard", "dashboard", "Data Team",
        Seq("c"), "example dashboard")))
    assert(dag.selectByTag("nightly") == Seq("a", "c"))
    assert(dag.selectByTag("nope").isEmpty)
    // tag selection + runSubset builds the tagged models (plus needed upstreams)
    val out = dag.runSubset(spark,
      Map("src" -> Tables.orders(spark, sf).limit(2)), tmp(),
      dag.selectByTag("nightly"))
    assert(out.contains("c") && out.contains("a"))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val man = om.readTree(dag.manifestJson(Map.empty))
    val exp = man.get("exposures").get("exposure.graft.exec_dashboard")
    assert(exp.get("type").asText == "dashboard")
    assert(exp.get("owner").asText == "Data Team")
    assert(exp.get("depends_on").get("nodes").get(0).asText == "model.graft.c")
    // an exposure must not reference unknown models
    intercept[IllegalArgumentException](new Pipeline(Seq(
      Model("x", Seq("src"), EphemeralMat, in => in("src"))),
      exposures = Seq(Exposure("bad", "dashboard", "t", Seq("ghost")))))
  }

  test("insert_overwrite incremental: delta partitions replace, others survive") {
    val dir = tmp()
    val orders = Tables.orders(spark, sf)
    def dag(df: org.apache.spark.sql.DataFrame) = new Pipeline(Seq(
      Model("iow", Seq("orders"), InsertOverwriteMat("o_orderstatus"), _ => df)))
    val base = orders.select(col("o_orderkey"), col("o_orderstatus"), lit(1.0).as("p"))
    dag(base).run(spark, Map("orders" -> orders), dir)
    // delta carries ONLY the F partition with a new payload
    val delta = orders.filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderstatus"), lit(2.0).as("p"))
    val out = dag(delta).run(spark, Map("orders" -> orders), dir)("iow")
    assert(out.count() == orders.count(), "partition replace changed the row count")
    assert(out.filter(col("o_orderstatus") === "F")
      .agg(min("p")).head.getDouble(0) == 2.0, "F partition not replaced")
    assert(out.filter(col("o_orderstatus") =!= "F")
      .agg(max("p")).head.getDouble(0) == 1.0, "untouched partition was rewritten")
  }

  test("state:modified+ selects changed models plus downstream, skips untouched") {
    val src = Map("src" -> Tables.orders(spark, sf).limit(5))
    def pipe(bChk: String, dCols: Seq[String]) = new Pipeline(Seq(
      Model("a", Seq("src"), EphemeralMat, in => in("src").select(col("o_orderkey"))),
      Model("b", Seq("a"), EphemeralMat, in => in("a"), checksum = bChk),
      Model("c", Seq("b"), EphemeralMat, in => in("b")),
      Model("d", Seq("src"), EphemeralMat,
        in => in("src").select(dCols.map(col): _*))))
    val p1 = pipe("v1", Seq("o_custkey"))
    val r1 = p1.run(spark, src, tmp())
    val oldManifest = p1.manifestJson(r1)
    // nothing changed → empty selection
    assert(p1.selectModifiedPlus(oldManifest, r1).isEmpty)
    // checksum bump on b → b plus its downstream c, not a/d
    val p2 = pipe("v2", Seq("o_custkey"))
    val r2 = p2.run(spark, src, tmp())
    assert(p2.selectModifiedPlus(oldManifest, r2) == Seq("b", "c"))
    // schema change on leaf d → d only
    val p3 = pipe("v1", Seq("o_custkey", "o_orderstatus"))
    val r3 = p3.run(spark, src, tmp())
    assert(p3.selectModifiedPlus(oldManifest, r3) == Seq("d"))
    // no prior state → everything is new
    assert(p1.selectModifiedPlus("""{"nodes":{}}""", r1).toSet ==
      Set("a", "b", "c", "d"))
  }

  test("prDataDiff: state-selected models report counts + capped EXCEPT " +
       "diffs; schema changes report mismatch; untouched models stay out") {
    val orders = Tables.orders(spark, sf).limit(100)
    val src = Map("src" -> orders)
    def pipe(thresh: Double, dCols: Seq[String]) = new Pipeline(Seq(
      Model("m_flag", Seq("src"), EphemeralMat, in => in("src")
        .select(col("o_orderkey"), (col("o_totalprice") > thresh).as("hot"))),
      Model("m_schema", Seq("src"), EphemeralMat,
        in => in("src").select(dCols.map(col): _*)),
      Model("m_same", Seq("src"), EphemeralMat,
        in => in("src").select(col("o_orderkey")))))
    val prodPipe = pipe(100000.0, Seq("o_custkey"))
    val prodRes = prodPipe.run(spark, src, tmp())
    val manifest = prodPipe.manifestJson(prodRes)
    // dev changes m_flag's logic (checksum-visible via the threshold
    // literal in the plan? no — schema is same, so bump via new column
    // set on m_schema and a changed resolved schema on m_flag)
    val devPipe = new Pipeline(Seq(
      Model("m_flag", Seq("src"), EphemeralMat, in => in("src")
        .select(col("o_orderkey"), (col("o_totalprice") > 200000.0).as("hot")),
        checksum = "v2"),
      Model("m_schema", Seq("src"), EphemeralMat,
        in => in("src").select(col("o_custkey"), col("o_orderstatus"))),
      Model("m_same", Seq("src"), EphemeralMat,
        in => in("src").select(col("o_orderkey")))))
    val devRes = devPipe.run(spark, src, tmp())
    val report = devPipe.prDataDiff(manifest, devRes, prodRes)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byModel = report.groupBy(_._1)
    assert(!byModel.contains("m_same"), "untouched model in the report")
    // m_flag: same schema → EXCEPT counts; flipped rows appear both ways
    val flag = byModel("m_flag").map(t => t._2 -> t._3).toMap
    val nFlipped = orders.filter(col("o_totalprice") > 100000.0 &&
      col("o_totalprice") <= 200000.0).count()
    assert(flag("summary_dev_rows") == 100 && flag("summary_prod_rows") == 100)
    assert(flag("in_dev_not_in_prod") == nFlipped &&
           flag("in_prod_not_in_dev") == nFlipped, flag.toString)
    // m_schema: column set changed → schema_mismatch, no EXCEPT rows
    val sch = byModel("m_schema").map(t => t._2 -> t._3).toMap
    assert(sch.contains("schema_mismatch") && !sch.contains("in_dev_not_in_prod"))
    // cap respected
    val capped = devPipe.prDataDiff(manifest, devRes, prodRes, limit = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .filter(t => t._1 == "m_flag" && t._2 == "in_dev_not_in_prod")
    assert(capped.head._3 == math.min(3, nFlipped), capped.toSeq.toString)
    // new model in dev
    val devPlus = new Pipeline(Seq(
      Model("m_same", Seq("src"), EphemeralMat,
        in => in("src").select(col("o_orderkey"))),
      Model("m_new", Seq("src"), EphemeralMat, in => in("src"))))
    val resPlus = devPlus.run(spark, src, tmp())
    val rep2 = devPlus.prDataDiff(manifest, resPlus, prodRes)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rep2.contains(("m_new", "new_model")))
  }

  test("incremental_predicates fence: outside rows untouched, inside rows merge") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pred").toString
    def pipe = new Pipeline(Seq(Model("inc", Seq("src"),
      IncrementalMat("id", predicates = Seq("d >= '2024-02-01'")),
      in => in("src"))))
    val run1 = Seq((1L, "2024-01-05", 10.0), (2L, "2024-02-10", 20.0))
      .toDF("id", "d", "v")
    pipe.run(spark, Map("src" -> run1), dir)
    // delta updates both keys, but id=1 sits OUTSIDE the fence: its base
    // row survives unchanged and the delta row INSERTS (dbt's documented
    // duplicate-key hazard); id=2 merges normally
    val run2 = Seq((1L, "2024-01-05", 11.0), (2L, "2024-02-10", 21.0))
      .toDF("id", "d", "v")
    val out = pipe.run(spark, Map("src" -> run2), dir)("inc")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(out == Set((1L, 10.0), (1L, 11.0), (2L, 21.0)), s"got $out")
  }

  test("microbatch materialization: delta periods replace partitions, others survive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mb").toString
    def pipe = new Pipeline(Seq(Model("mb", Seq("src"), MicrobatchMat("d", "month"),
      in => in("src"))))
    val run1 = Seq((1L, "2024-01-05", 10.0), (2L, "2024-02-10", 20.0))
      .toDF("id", "d", "v")
    pipe.run(spark, Map("src" -> run1), dir)
    // second run: delta only touches February; re-emits id=3, drops id=2
    val run2 = Seq((3L, "2024-02-20", 30.0)).toDF("id", "d", "v")
    val out = pipe.run(spark, Map("src" -> run2), dir)("mb")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(out == Set((1L, 10.0), (3L, 30.0)), s"got $out")
    // full refresh rebuilds from the delta alone
    val out2 = pipe.run(spark, Map("src" -> run2), dir, fullRefresh = true)("mb")
      .collect().map(_.getLong(0)).toSet
    assert(out2 == Set(3L))
  }

  test("--defer: selected model builds against prod artifacts, parents " +
       "are not rebuilt") {
    val orders = Tables.orders(spark, sf)
    val stg = Model("stg_o", Seq("orders"), TableMat(),
      in => in("orders").select(col("o_orderkey").as("id"),
        col("o_totalprice").as("v")))
    val fct = Model("fct_sum", Seq("stg_o"), TableMat(),
      in => in("stg_o").agg(sum("v").as("total")))
    val dag = new Pipeline(Seq(stg, fct))
    // prod run builds everything
    val prodDir = tmp()
    val prod = dag.run(spark, Map("orders" -> orders), prodDir)
    val stgMtime = new java.io.File(s"$prodDir/stg_o").lastModified
    // CI: only fct is selected (say it was modified); stg defers to prod
    val ciDir = tmp()
    val ci = dag.runDeferred(spark, Map("orders" -> orders), ciDir,
      select = Seq("fct_sum"), deferDir = prodDir)
    assert(rows(ci("fct_sum")) == rows(prod("fct_sum")))
    assert(!new java.io.File(s"$ciDir/stg_o").exists, "parent rebuilt in CI dir")
    assert(new java.io.File(s"$prodDir/stg_o").lastModified == stgMtime,
      "prod artifact touched")
    // a parent missing from the state dir is a loud error, not a rebuild
    val err = intercept[IllegalArgumentException](
      dag.runDeferred(spark, Map("orders" -> orders), tmp(),
        select = Seq("fct_sum"), deferDir = tmp()))
    assert(err.getMessage.contains("--defer"))
  }

  test("retry: failed model and its skipped downstream re-run; successful " +
       "parent's artifact is reused untouched") {
    val orders = Tables.orders(spark, sf)
    var bomb = true // first build of `mid` throws, the retry succeeds
    val a = Model("base_t", Seq("orders"), TableMat(),
      in => in("orders").select(col("o_orderkey").as("id"),
        col("o_totalprice").as("v")))
    val b = Model("mid", Seq("base_t"), TableMat(),
      in => { if (bomb) throw new RuntimeException("flaky upstream")
              in("base_t").filter(col("v") > 100) })
    val c = Model("leaf", Seq("mid"), TableMat(),
      in => in("mid").agg(count(lit(1)).as("n")))
    val dag = new Pipeline(Seq(a, b, c))
    val dir = tmp()
    val (out1, st1) = dag.runTolerant(spark, Map("orders" -> orders), dir)
    assert(st1("base_t") == "success" && st1("mid").startsWith("error") &&
           st1("leaf") == "skipped", st1.toString)
    assert(out1.contains("base_t") && !out1.contains("leaf"))
    val baseMtime = new java.io.File(s"$dir/base_t").lastModified
    bomb = false
    val (out2, st2) = dag.retry(spark, Map("orders" -> orders), dir, st1)
    assert(st2.values.forall(_ == "success"), st2.toString)
    assert(new java.io.File(s"$dir/base_t").lastModified == baseMtime,
      "successful parent was rebuilt on retry")
    // leaf is correct against the reused artifact
    val expected = orders.filter(col("o_totalprice") > 100).count()
    assert(out2("leaf").collect()(0).getLong(0) == expected)
    // a clean run retries nothing and stays all-success
    val (_, st3) = dag.retry(spark, Map("orders" -> orders), dir, st2)
    assert(st3.values.forall(_ == "success"))
  }

  test("TableFormat seam: every table-family materialization routes " +
       "through the format; a wrapped format produces identical results") {
    import graft.sources.{ParquetDirFormat, TableFormat}
    val calls = scala.collection.mutable.Set[String]()
    // a drop-in format that spies on the seam, delegating to parquet —
    // exactly the shape a Delta/Iceberg implementation would take
    object SpyFormat extends TableFormat {
      def write(df: org.apache.spark.sql.DataFrame, path: String,
                partitionBy: Option[String], clusterBy: Seq[String]): Unit = {
        calls.synchronized { calls += "write" }
        ParquetDirFormat.write(df, path, partitionBy, clusterBy)
      }
      def overwritePartitions(df: org.apache.spark.sql.DataFrame,
                              path: String, partitionCol: String): Unit = {
        calls.synchronized { calls += "overwritePartitions" }
        ParquetDirFormat.overwritePartitions(df, path, partitionCol)
      }
      def replace(spark: org.apache.spark.sql.SparkSession,
                  df: org.apache.spark.sql.DataFrame, path: String): Unit = {
        calls.synchronized { calls += "replace" }
        ParquetDirFormat.replace(spark, df, path)
      }
      def compact(spark: org.apache.spark.sql.SparkSession, path: String,
                  partitionCol: String, targetBytes: Long): Map[String, Int] = {
        calls.synchronized { calls += "compact" }
        ParquetDirFormat.compact(spark, path, partitionCol, targetBytes)
      }
      def deleteKeys(spark: org.apache.spark.sql.SparkSession, path: String,
                     partitionCol: String, keyCol: String,
                     keys: org.apache.spark.sql.DataFrame): Seq[String] = {
        calls.synchronized { calls += "deleteKeys" }
        ParquetDirFormat.deleteKeys(spark, path, partitionCol, keyCol, keys)
      }
      def read(spark: org.apache.spark.sql.SparkSession,
               path: String): org.apache.spark.sql.DataFrame = {
        calls.synchronized { calls += "read" }
        ParquetDirFormat.read(spark, path)
      }
    }
    val orders = Tables.orders(spark, sf)
    def mk(fmt: TableFormat) = new Pipeline(Seq(
      Model("f_table", Seq("orders"), TableMat(Some("o_orderstatus"), Seq("o_orderkey")),
        in => in("orders").select("o_orderkey", "o_orderstatus", "o_totalprice")),
      Model("f_io", Seq("orders"), InsertOverwriteMat("o_orderstatus"),
        in => in("orders").select("o_orderkey", "o_orderstatus")),
      Model("f_inc", Seq("orders"), IncrementalMat("o_orderkey"),
        in => in("orders").select("o_orderkey", "o_totalprice")),
      Model("f_mb", Seq("orders"), MicrobatchMat("o_orderdate"),
        in => in("orders").select("o_orderkey", "o_orderdate"))),
      format = fmt)
    val spyOut = mk(SpyFormat).run(spark, Map("orders" -> orders), tmp())
    assert(Set("write", "overwritePartitions", "replace", "read")
      .subsetOf(calls.toSet) || // first run of io/mb takes the write path
      Set("write", "replace", "read").subsetOf(calls.toSet), calls.toString)
    val refOut = mk(ParquetDirFormat).run(spark, Map("orders" -> orders), tmp())
    Seq("f_table", "f_io", "f_inc", "f_mb").foreach { n =>
      assert(rows(spyOut(n).orderBy("o_orderkey")) ==
             rows(refOut(n).orderBy("o_orderkey")), n)
    }
  }

  test("targets: same DAG against dev and prod isolates warehouses, " +
       "applies/restores per-target conf, and --defer resolves across targets") {
    val orders = Tables.orders(spark, sf)
    def dag = new Pipeline(Seq(
      Model("t_stg", Seq("orders"), TableMat(),
        in => in("orders").select(col("o_orderkey").as("id"),
          col("o_totalprice").as("v"))),
      Model("t_fct", Seq("t_stg"), TableMat(),
        in => in("t_stg").agg(count(lit(1)).as("n"),
          graft.util.Det.centsSum(col("v")).as("total")))))
    val dev = Target("dev", tmp(), threads = 2,
      sparkConf = Map("spark.sql.shuffle.partitions" -> "7"))
    val prod = Target("prod", tmp(), threads = 2)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    @volatile var seenConf: String = null
    val hooks = RunHooks(afterModel =
      (_, _) => seenConf = spark.conf.get("spark.sql.shuffle.partitions"))
    // dev runs on HALF the orders; prod on all — outputs must not mix
    val devOut = dag.runTarget(spark,
      Map("orders" -> orders.filter(col("o_orderkey") % 2 === 0)), dev, hooks)
    assert(seenConf == "7", "per-target conf not applied during the run")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
      "per-target conf leaked into the session")
    val prodOut = dag.runTarget(spark, Map("orders" -> orders), prod)
    // artifacts landed under their own warehouses, and differ
    assert(new java.io.File(s"${dev.warehousePath}/t_fct").exists())
    assert(new java.io.File(s"${prod.warehousePath}/t_fct").exists())
    val devN = devOut("t_fct").collect()(0).getLong(0)
    val prodN = prodOut("t_fct").collect()(0).getLong(0)
    assert(devN < prodN && prodN == orders.count(), s"$devN vs $prodN")
    // slim CI: build only t_fct into a ci target, deferring t_stg to PROD's
    // artifact — result equals prod's own t_fct, not dev's
    val ci = Target("ci", tmp())
    val ciOut = dag.runDeferredTarget(spark, Map("orders" -> orders),
      ci, select = Seq("t_fct"), deferTo = prod)
    assert(rows(ciOut("t_fct")) == rows(prodOut("t_fct")))
    assert(!new java.io.File(s"${ci.warehousePath}/t_stg").exists(),
      "deferred parent must not rebuild in the CI target")
    // unknown target name fails loudly
    assert(intercept[IllegalArgumentException](
      Target.resolve(Seq(dev, prod), "staging")).getMessage.contains("staging"))
  }

  test("run(threads=2): independent models materialize CONCURRENTLY and " +
       "the result matches the sequential run") {
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    val orders = Tables.orders(spark, sf)
    val startedA = new CountDownLatch(1)
    val startedB = new CountDownLatch(1)
    @volatile var overlaps = 0
    def sync(mine: CountDownLatch, other: CountDownLatch): Unit = {
      mine.countDown()
      // proves true concurrency: each side blocks until the OTHER model's
      // build has started — impossible under sequential execution
      assert(other.await(30, TimeUnit.SECONDS), "independent models never overlapped")
      synchronized { overlaps += 1 }
    }
    def modelA(s: CountDownLatch, o: CountDownLatch) = Seq(
      Model("par_a", Seq("orders"), TableMat(),
        in => { if (s != null) sync(s, o)
                in("orders").select(col("o_orderkey").as("id"),
                  col("o_totalprice").as("v")) }),
      Model("par_b", Seq("orders"), TableMat(),
        in => { if (s != null) sync(o, s)
                in("orders").groupBy("o_orderstatus")
                  .agg(count(lit(1)).as("n")) }),
      Model("par_leaf", Seq("par_a", "par_b"), TableMat(),
        in => in("par_a").agg(count(lit(1)).as("rows_a"))
          .crossJoin(in("par_b").agg(count(lit(1)).as("rows_b")))))
    val par = new Pipeline(modelA(startedA, startedB))
      .run(spark, Map("orders" -> orders), tmp(), threads = 2)
    assert(overlaps == 2)
    val seq = new Pipeline(modelA(null, null))
      .run(spark, Map("orders" -> orders), tmp())
    assert(rows(par("par_leaf")) == rows(seq("par_leaf")))
    assert(rows(par("par_a").orderBy("id")) == rows(seq("par_a").orderBy("id")))
  }

  test("run(threads=2): a failure rethrows, descendants never start, " +
       "in-flight siblings drain") {
    val orders = Tables.orders(spark, sf)
    @volatile var childRan = false
    val boom = Model("boom_t", Seq("orders"), TableMat(),
      _ => throw new RuntimeException("kaput"))
    val child = Model("boom_child", Seq("boom_t"), TableMat(),
      in => { childRan = true; in("boom_t") })
    val sibling = Model("boom_sib", Seq("orders"), TableMat(),
      in => in("orders").select(col("o_orderkey").as("id")))
    val dag = new Pipeline(Seq(boom, child, sibling))
    val err = intercept[RuntimeException](
      dag.run(spark, Map("orders" -> orders), tmp(), threads = 2))
    assert(err.getMessage == "kaput")
    assert(!childRan, "descendant of the failed model must never run")
  }

  test("build(threads=2): failing test still gates downstream; parallel " +
       "statuses match sequential semantics") {
    val orders = Tables.orders(spark, sf)
    val stg = Model("pstg", Seq("orders"), TableMat(),
      in => in("orders").select(col("o_orderkey").as("id"),
        col("o_totalprice").as("v")),
      tests = Seq("always_fails" ->
        ((df: org.apache.spark.sql.DataFrame) => df.limit(3))))
    val fct = Model("pfct", Seq("pstg"), TableMat(),
      in => in("pstg").agg(count(lit(1)).as("n")))
    val ok = Model("pok", Seq("orders"), TableMat(),
      in => in("orders").agg(count(lit(1)).as("n")))
    val (out, st) = new Pipeline(Seq(stg, fct, ok))
      .build(spark, Map("orders" -> orders), tmp(), threads = 2)
    assert(st("pstg").startsWith("fail: test always_fails"), st.toString)
    assert(st("pfct") == "skipped" && !out.contains("pfct"))
    assert(st("pok") == "success")
  }

  test("retry: a successful view outside the failed closure is NOT " +
       "re-resolved; a view upstream of the failure is") {
    val orders = Tables.orders(spark, sf)
    var bomb = true
    var unrelatedBuilds = 0
    var upstreamBuilds = 0
    val unrelated = Model("v_unrelated", Seq("orders"), ViewMat,
      in => { unrelatedBuilds += 1
              in("orders").select(col("o_orderkey").as("id")) })
    val upstream = Model("v_upstream", Seq("orders"), ViewMat,
      in => { upstreamBuilds += 1
              in("orders").select(col("o_orderkey").as("id"),
                col("o_totalprice").as("v")) })
    val flaky = Model("t_flaky", Seq("v_upstream"), TableMat(),
      in => { if (bomb) throw new RuntimeException("boom")
              in("v_upstream").filter(col("v") > 100) })
    val dag = new Pipeline(Seq(unrelated, upstream, flaky))
    val dir = tmp()
    val (_, st1) = dag.runTolerant(spark, Map("orders" -> orders), dir)
    assert(st1("t_flaky").startsWith("error") &&
           st1("v_unrelated") == "success" && st1("v_upstream") == "success")
    val (a1, u1) = (unrelatedBuilds, upstreamBuilds)
    bomb = false
    val (_, st2) = dag.retry(spark, Map("orders" -> orders), dir, st1)
    assert(st2.values.forall(_ == "success"), st2.toString)
    assert(unrelatedBuilds == a1,
      s"unrelated view rebuilt on retry ($a1 -> $unrelatedBuilds)")
    assert(upstreamBuilds > u1,
      "upstream view of the failed model must re-resolve (no artifact)")
    // the unrelated view keeps its prior success in the merged statuses
    assert(st2("v_unrelated") == "success")
  }

  test("build: a failing test gates downstream like a build error; clean " +
       "tests pass through") {
    val orders = Tables.orders(spark, sf)
    var ceiling = 0.0 // first build: everything violates; then none
    val stg = Model("stg_b", Seq("orders"), TableMat(),
      in => in("orders").select(col("o_orderkey").as("id"),
        col("o_totalprice").as("v")),
      tests = Seq("v_below_ceiling" ->
        ((df: org.apache.spark.sql.DataFrame) => df.filter(col("v") > ceiling))))
    val fct = Model("fct_b", Seq("stg_b"), TableMat(),
      in => in("stg_b").agg(count(lit(1)).as("n")))
    val dag = new Pipeline(Seq(stg, fct))
    val dir = tmp()
    val (out1, st1) = dag.build(spark, Map("orders" -> orders), dir)
    assert(st1("stg_b").startsWith("fail: test v_below_ceiling"), st1.toString)
    assert(st1("fct_b") == "skipped" && !out1.contains("fct_b"))
    ceiling = Double.MaxValue
    val (out2, st2) = dag.retry(spark, Map("orders" -> orders), dir, st1)
    assert(st2.values.forall(_ == "success"), st2.toString)
    assert(out2("fct_b").collect()(0).getLong(0) == orders.count())
  }

  test("model contracts: schema freeze + row constraints gate like build " +
       "errors; contract edits trip state:modified") {
    val orders = Tables.orders(spark, sf)
    val contract = Contract(
      columns = Seq("id" -> "bigint", "v" -> "double"),
      notNull = Seq("id"),
      checks = Map("v_nonneg" -> "v >= 0"))
    def mk(c: Contract, negate: Boolean = false) = new Pipeline(Seq(
      Model("api_m", Seq("orders"), TableMat(),
        in => in("orders").select(col("o_orderkey").as("id"),
          (if (negate) -col("o_totalprice") else col("o_totalprice")).as("v")),
        contract = Some(c)),
      Model("fct_c", Seq("api_m"), TableMat(),
        in => in("api_m").agg(count(lit(1)).as("n")))))
    // conforming model materializes normally
    val dir = tmp()
    val out = mk(contract).run(spark, Map("orders" -> orders), dir)
    assert(out("api_m").count() == orders.count())
    // retyped column refuses driver-side, before any job runs
    val retyped = contract.copy(columns = Seq("id" -> "int", "v" -> "double"))
    val e1 = intercept[IllegalArgumentException] {
      mk(retyped).run(spark, Map("orders" -> orders), tmp())
    }
    assert(e1.getMessage.contains("declared int"), e1.getMessage)
    // undeclared column refuses too (a contract is a freeze, not a minimum)
    val narrower = contract.copy(columns = Seq("id" -> "bigint"))
    assert(intercept[IllegalArgumentException] {
      mk(narrower).run(spark, Map("orders" -> orders), tmp())
    }.getMessage.contains("undeclared column v"))
    // row-constraint violation fails INSIDE the materializing job and, in
    // build, gates the downstream closure exactly like a build error
    val (outB, stB) = mk(contract, negate = true)
      .build(spark, Map("orders" -> orders), tmp())
    assert(stB("api_m").startsWith("error:"), stB.toString)
    assert(stB("fct_c") == "skipped" && !outB.contains("fct_c"))
    // contract identity is manifest-visible: a changed check reselects the
    // model + downstream under state:modified
    val p1 = mk(contract)
    val res = p1.run(spark, Map("orders" -> orders), tmp())
    val manifest = p1.manifestJson(res)
    assert(manifest.contains("\"contract\""))
    val p2 = mk(contract.copy(checks = Map("v_nonneg" -> "v >= 1")))
    assert(p2.selectModifiedPlus(manifest, res) == Seq("api_m", "fct_c"))
  }

  test("view contract survives a pruning consumer (guard is a Filter, " +
       "not a prunable projection alias)") {
    // r7 advice: the first-column Project guard was removed by column
    // pruning whenever the consumer read no guarded column — count(lit(1))
    // over a contracted VIEW sailed past violations. The Filter guard must
    // throw for ANY consumer shape.
    val orders = Tables.orders(spark, sf)
    val contract = Contract(columns = Seq("id" -> "bigint", "v" -> "double"),
      checks = Map("v_nonneg" -> "v >= 0"))
    val p = new Pipeline(Seq(
      Model("bad_view", Seq("orders"), ViewMat,
        in => in("orders").select(col("o_orderkey").as("id"),
          (-col("o_totalprice")).as("v")),
        contract = Some(contract)),
      // reads NO columns of the view: the pruning consumer
      Model("n_rows", Seq("bad_view"), TableMat(),
        in => in("bad_view").agg(count(lit(1)).as("n")))))
    val (_, st) = p.build(spark, Map("orders" -> orders), tmp())
    assert(st.values.exists(_.startsWith("error:")),
      s"violation must surface through the pruning consumer: $st")
    // and a select of a non-guard column enforces too
    val p2 = new Pipeline(Seq(
      Model("bad_view", Seq("orders"), ViewMat,
        in => in("orders").select(col("o_orderkey").as("id"),
          (-col("o_totalprice")).as("v")),
        contract = Some(contract)),
      Model("only_v", Seq("bad_view"), TableMat(),
        in => in("bad_view").select("v"))))
    val (_, st2) = p2.build(spark, Map("orders" -> orders), tmp())
    assert(st2.values.exists(_.startsWith("error:")), st2.toString)
  }

  test("dbt clone: table models spring from source state without " +
       "recompute; zero-copy on the txlog format") {
    val orders = Tables.orders(spark, sf)
    var builds = 0
    def mk(fmt: graft.sources.TableFormat) = new Pipeline(Seq(
      Model("cl_stg", Seq("orders"), TableMat(),
        in => { builds += 1; in("orders").select("o_orderkey", "o_totalprice") }),
      Model("cl_view", Seq("cl_stg"), ViewMat, in => in("cl_stg"))),
      format = fmt)
    for (fmt <- Seq[graft.sources.TableFormat](
        graft.sources.TxLogFormat, graft.sources.ParquetDirFormat)) {
      val prod = tmp(); val dev = tmp()
      val p = mk(fmt)
      p.run(spark, Map("orders" -> orders), prod)
      val before = builds
      val cloned = p.cloneFrom(spark, prod, dev)
      assert(builds == before, "clone must not recompute models")
      assert(cloned.keySet == Set("cl_stg"), "views have no artifact to clone")
      assert(rows(cloned("cl_stg").orderBy("o_orderkey")) ==
        rows(orders.select("o_orderkey", "o_totalprice").orderBy("o_orderkey")))
      if (fmt == graft.sources.TxLogFormat) {
        // zero-copy: cloned data files share inodes with the source's
        import java.nio.file.{Files, Paths}
        import scala.jdk.CollectionConverters._
        val w = Files.walk(Paths.get(s"$dev/cl_stg"))
        val rel = try w.iterator.asScala
          .find(f => Files.isRegularFile(f) && f.toString.endsWith(".parquet"))
          .map(Paths.get(s"$dev/cl_stg").relativize(_).toString).get
        finally w.close()
        assert(Files.isSameFile(Paths.get(s"$dev/cl_stg", rel),
          Paths.get(s"$prod/cl_stg", rel)), "txlog clone must hard-link")
      }
      // a model with no source artifact refuses loudly
      assert(intercept[IllegalArgumentException] {
        p.cloneFrom(spark, tmp(), tmp())
      }.getMessage.contains("no artifact"))
    }
  }

  test("semantic layer: governed slicings only; metric == direct agg; " +
       "multi-metric rides one pass") {
    val orders = Tables.orders(spark, sf)
    val revenue = Metric("revenue", "stg_m",
      "sum(cast(round(o_totalprice * 100, 0) as bigint)) / cast(100 as double)",
      dimensions = Seq("o_orderpriority"),
      timeDimension = Some("o_orderdate"),
      filter = Some("o_orderstatus <> 'F'"))
    val nOrders = Metric("n_orders", "stg_m", "count(*)",
      dimensions = Seq("o_orderpriority"))
    val dag = new Pipeline(
      Seq(Model("stg_m", Seq("orders"), ViewMat, in => in("orders"))),
      metrics = Seq(revenue, nOrders))
    val resolved = dag.run(spark, Map("orders" -> orders), tmp())
    // the compiled metric equals the hand-written aggregate
    val got = dag.queryMetric(resolved, "revenue", Seq("o_orderpriority"))
      .collect().map(_.toSeq).toSet
    val direct = orders.filter(col("o_orderstatus") =!= "F")
      .groupBy("o_orderpriority")
      .agg((sum(round(col("o_totalprice") * 100, 0).cast("bigint")) / 100.0)
        .as("revenue"))
      .collect().map(_.toSeq).toSet
    assert(got == direct && got.nonEmpty)
    // governance: undeclared dims/filters and grainless rollups refuse
    assert(intercept[IllegalArgumentException] {
      dag.queryMetric(resolved, "revenue", Seq("o_custkey"))
    }.getMessage.contains("undeclared"))
    assert(intercept[IllegalArgumentException] {
      dag.queryMetric(resolved, "revenue", Nil, where = Some("o_custkey > 5"))
    }.getMessage.contains("undeclared"))
    // subqueries refuse outright: attribute collection does not descend
    // into a subquery's plan, so they could smuggle undeclared columns
    assert(intercept[IllegalArgumentException] {
      dag.queryMetric(resolved, "revenue", Nil,
        where = Some("exists(select 1 from t where o_custkey > 5)"))
    }.getMessage.contains("subquer"))
    assert(intercept[IllegalArgumentException] {
      dag.queryMetric(resolved, "revenue", Nil,
        where = Some("o_orderpriority in (select p from t)"))
    }.getMessage.contains("subquer"))
    assert(intercept[IllegalArgumentException] {
      dag.queryMetric(resolved, "n_orders", Nil, grain = Some("month"))
    }.getMessage.contains("time dimension"))
    assert(intercept[IllegalArgumentException] {
      new Pipeline(Seq(Model("m1", Seq("orders"), ViewMat, in => in("orders"))),
        metrics = Seq(revenue))
    }.getMessage.contains("unknown model"))
    // multi-metric merge: per-metric filters become FILTER(WHERE) — one
    // scan, values equal to the separate queries
    val both = Metrics.queryAll(resolved("stg_m"), Seq(revenue, nOrders),
      Seq("o_orderpriority")).collect()
    val revByPrio = got.map(r => r(0) -> r(1)).toMap
    val cntByPrio = Metrics.query(resolved("stg_m"), nOrders,
        Seq("o_orderpriority")).collect().map(r => r.get(0) -> r.get(1)).toMap
    both.foreach { r =>
      assert(revByPrio(r.get(0)) == r.get(1), s"revenue diverged at ${r.get(0)}")
      assert(cntByPrio(r.get(0)) == r.get(2), s"count diverged at ${r.get(0)}")
    }
    // manifest carries the metric definitions
    assert(dag.manifestJson(resolved).contains("\"metric.graft.revenue\""))
  }

  test("salted join returns exactly the plain join's rows") {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, "o_custkey")
      .select("o_orderkey", "c_name").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(orders, customer, "o_custkey", 8,
        col("o_orderkey"))
      .select("o_orderkey", "c_name").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("test severity: warn-level failures never gate the downstream " +
       "closure, land as 'warn' in run_results, and retry skips them") {
    val orders = Tables.orders(spark, sf)
    // every row violates → count is huge; severity decides the outcome
    val violate = (df: org.apache.spark.sql.DataFrame) => df.filter(lit(true))
    val stg = Model("stg_w", Seq("orders"), TableMat(),
      in => in("orders").select(col("o_orderkey").as("id")),
      tests = Seq("always_fails" -> violate),
      testConfig = Map("always_fails" -> TestConfig(severity = "warn")))
    val fct = Model("fct_w", Seq("stg_w"), TableMat(),
      in => in("stg_w").agg(count(lit(1)).as("n")))
    val dag = new Pipeline(Seq(stg, fct))
    val dir = tmp()
    val (out, st) = dag.build(spark, Map("orders" -> orders), dir)
    assert(st("stg_w").startsWith("warn: test always_fails"), st.toString)
    assert(st("fct_w") == "success", st.toString) // child built anyway
    assert(out("fct_w").collect()(0).getLong(0) == orders.count())
    val rr = dag.runResultsJson(st)
    assert(rr.contains(""""status":"warn"""") && rr.contains("always_fails"))
    // retry: a warned model completed — nothing to re-run
    val (_, st2) = dag.retry(spark, Map("orders" -> orders), dir, st)
    assert(st2 == st, st2.toString)
  }

  test("test thresholds: error_if/warn_if counts pick the dbt outcome") {
    // 5 violations: error_if '> 10' not met, warn_if '> 3' met → warn;
    // tighten error_if to '> 4' → fail
    val orders = Tables.orders(spark, sf)
    def mk(errorIf: String) = new Pipeline(Seq(
      Model("m_t", Seq("orders"), TableMat(),
        in => in("orders").select(col("o_orderkey").as("id")),
        tests = Seq("five_rows" ->
          ((df: org.apache.spark.sql.DataFrame) => df.limit(5))),
        testConfig = Map("five_rows" ->
          TestConfig("error", warnIf = "> 3", errorIf = errorIf)))))
    val (_, warn) = mk("> 10").build(spark, Map("orders" -> orders), tmp())
    assert(warn("m_t").startsWith("warn: test five_rows (5 violations)"),
      warn.toString)
    val (_, fail) = mk("> 4").build(spark, Map("orders" -> orders), tmp())
    assert(fail("m_t").startsWith("fail: test five_rows"), fail.toString)
    // severity=warn NEVER errors, whatever the counts
    val soft = new Pipeline(Seq(
      Model("m_s", Seq("orders"), TableMat(),
        in => in("orders").select(col("o_orderkey").as("id")),
        tests = Seq("all_rows" ->
          ((df: org.apache.spark.sql.DataFrame) => df)),
        testConfig = Map("all_rows" -> TestConfig("warn")))))
    val (_, st) = soft.build(spark, Map("orders" -> orders), tmp())
    assert(st("m_s").startsWith("warn:"), st.toString)
    // malformed condition refuses loudly instead of never firing
    intercept[IllegalArgumentException](TestConfig.eval("banana", 3))
  }

  test("test thresholds above 1000: the scan cap sizes to the config, so " +
       "large error_if fires and less-than warn_if can't fire spuriously") {
    val lineitem = Tables.lineitem(spark, sf)
    val n = lineitem.count() // ~6k at sf0.001 — above the old 1001 cap
    assert(n > 1001, s"need a >1001-row table for this spec, got $n")
    def mk(name: String, cfg: TestConfig) = new Pipeline(Seq(
      Model(name, Seq("lineitem"), TableMat(),
        in => in("lineitem").select(col("l_orderkey").as("id")),
        tests = Seq("big" -> ((df: org.apache.spark.sql.DataFrame) => df)),
        testConfig = Map("big" -> cfg))))
    // error_if '> 2000' with n≈6k violations: a 1001-capped count would
    // read 1001 and silently pass; the config-sized cap must fire
    val (_, st1) = mk("m_hi", TestConfig("error", warnIf = "> 5", errorIf = "> 2000"))
      .build(spark, Map("lineitem" -> lineitem), tmp())
    assert(st1("m_hi") == "fail: test big (2000+ violations)", st1.toString)
    // warn_if '< 5000' with n≈6k: the TRUE count is not below 5000, so no
    // warn — a capped count of 1001 would have fired spuriously
    val (_, st2) = mk("m_lt", TestConfig("warn", warnIf = "< 5000"))
      .build(spark, Map("lineitem" -> lineitem), tmp())
    assert(st2("m_lt") == "success", st2.toString)
    // cap sizing: default floor 1001; sized to max threshold + 1 above it
    assert(TestConfig().countCap == 1001)
    assert(TestConfig("error", warnIf = "> 5", errorIf = "> 2000").countCap == 2001)
    assert(TestConfig("warn", warnIf = "< 5000").countCap == 5001)
  }

  test("store_failures: the full violation set persists as an auditable " +
       "table; counts in run_results are exact, not capped") {
    val orders = Tables.orders(spark, sf)
    val n = orders.count()
    val dag = new Pipeline(Seq(
      Model("m_sf", Seq("orders"), TableMat(),
        in => in("orders").select(col("o_orderkey").as("id")),
        tests = Seq("all_violate" ->
          ((df: org.apache.spark.sql.DataFrame) => df)),
        testConfig = Map("all_violate" ->
          TestConfig(severity = "warn", storeFailures = true)))))
    val dir = tmp()
    val (_, st) = dag.build(spark, Map("orders" -> orders), dir)
    // exact count in the message (a capped scan would say 1000+)
    assert(st("m_sf") == s"warn: test all_violate ($n violations)", st.toString)
    // audit table is namespaced by MODEL: same-named tests on two models
    // must not overwrite each other (or race under threads > 1)
    val stored = spark.read.parquet(s"$dir/dbt_test__audit/m_sf/all_violate")
    assert(stored.count() == n && stored.columns.toSeq == Seq("id"))
  }

  test("zero-matching test conditions fire on an empty result " +
       "(dbt's assert-rows-exist pattern)") {
    val orders = Tables.orders(spark, sf)
    val dag = new Pipeline(Seq(
      Model("m_z", Seq("orders"), TableMat(),
        in => in("orders").select(col("o_orderkey").as("id")),
        // test returns 0 rows; error_if '= 0' means THAT is the failure
        tests = Seq("rows_exist" ->
          ((df: org.apache.spark.sql.DataFrame) => df.limit(0))),
        testConfig = Map("rows_exist" ->
          TestConfig("error", warnIf = "< 0", errorIf = "= 0")))))
    val (_, st) = dag.build(spark, Map("orders" -> orders), tmp())
    assert(st("m_z").startsWith("fail: test rows_exist (0 violations)"),
      st.toString)
  }

  test("yaml test configs: severity/warn_if/error_if parse from both " +
       "column-nested and model-level forms") {
    val cfgs = ProjectYaml.loadTestConfigs(
      """models:
        |  - name: stg_example
        |    tests:
        |      - unique:
        |          column_name: id
        |          config:
        |            severity: warn
        |    columns:
        |      - name: amount
        |        tests:
        |          - not_null:
        |              config:
        |                severity: error
        |                warn_if: "> 10"
        |                error_if: "> 100"
        |                store_failures: true
        |          - unique
        |""".stripMargin)
    val c = cfgs("stg_example")
    assert(c("unique_stg_example_id") == TestConfig("warn"))
    assert(c("not_null_stg_example_amount") ==
      TestConfig("error", "> 10", "> 100", storeFailures = true))
    assert(!c.contains("unique_stg_example_amount")) // bare kind: no config
  }

  test("access=private without a group refuses at construction (an " +
       "ungrouped private model would be ref-able by any ungrouped model)") {
    val e = intercept[IllegalArgumentException](new Pipeline(Seq(
      Model("core", Seq("src"), EphemeralMat, in => in("src"),
        access = "private"))))
    assert(e.getMessage.contains("requires a group"))
  }

  test("alias + custom schema relocate the relation; clone and defer " +
       "resolve the moved artifact") {
    val orders = Tables.orders(spark, sf)
    val stg = Model("stg_a", Seq("orders"), TableMat(),
      in => in("orders").select(col("o_orderkey").as("id")),
      alias = Some("stg_aliased"), schemaOverride = Some("staging"))
    val fct = Model("fct_a", Seq("stg_a"), TableMat(),
      in => in("stg_a").agg(count(lit(1)).as("n")))
    val dag = new Pipeline(Seq(stg, fct))
    val prodDir = tmp()
    val resolved = dag.run(spark, Map("orders" -> orders), prodDir)
    assert(new java.io.File(s"$prodDir/staging/stg_aliased").exists())
    assert(!new java.io.File(s"$prodDir/stg_a").exists())
    // manifest carries the relation identity for movement detection
    val man = dag.manifestJson(resolved)
    assert(man.contains(""""schema":"staging"""") &&
      man.contains(""""alias":"stg_aliased""""))
    // clone resolves the moved source artifact and keeps the layout
    val cloneDir = tmp()
    val cloned = dag.cloneFrom(spark, prodDir, cloneDir)
    assert(new java.io.File(s"$cloneDir/staging/stg_aliased").exists())
    assert(cloned("stg_a").count() == orders.count())
    // --defer against prod state finds the aliased parent artifact
    val ciDir = tmp()
    val deferred = dag.runDeferred(spark, Map("orders" -> orders), ciDir,
      Seq("fct_a"), prodDir)
    assert(deferred("fct_a").collect()(0).getLong(0) == orders.count())
  }

  test("prSchemaDiff: movement, table-type, partitioning/clustering and " +
       "column changes per model; new/removed models surface") {
    import graft.operators.Diff
    val orders = Tables.orders(spark, sf)
    def base(part: Option[String], alias: Option[String]) = Seq(
      Model("stg_p", Seq("orders"), TableMat(partitionBy = part),
        in => in("orders").select(col("o_orderkey").as("id"),
          col("o_orderstatus").as("status")),
        alias = alias),
      Model("mart_gone", Seq("orders"), TableMat(),
        in => in("orders").select(col("o_orderkey").as("id"))),
      Model("mart_t", Seq("orders"), TableMat(),
        in => in("orders").select(col("o_orderkey").as("id"))))
    val prodDag = new Pipeline(base(None, None))
    val prodRes = prodDag.run(spark, Map("orders" -> orders), tmp())
    val prodMan = prodDag.manifestJson(prodRes)
    // PR: partitions stg_p, moves it via alias, drops mart_gone, adds a
    // model, retypes a column
    val prDag = new Pipeline(Seq(
      Model("stg_p", Seq("orders"),
        TableMat(partitionBy = Some("status"), clusterBy = Seq("id")),
        in => in("orders").select(col("o_orderkey").cast("int").as("id"),
          col("o_orderstatus").as("status"), lit(1).as("build_id")),
        alias = Some("stg_p_v2")),
      Model("mart_new", Seq("orders"), ViewMat,
        in => in("orders").select(col("o_orderkey").as("id"))),
      Model("mart_t", Seq("orders"), ViewMat, // table in prod → view in PR
        in => in("orders").select(col("o_orderkey").as("id")))))
    val prRes = prDag.run(spark, Map("orders" -> orders), tmp())
    val prMan = prDag.manifestJson(prRes)
    val report = Diff.prSchemaDiff(prMan, Some(prodMan),
      prRes.map { case (k, v) => k -> v.schema },
      prodRes.map { case (k, v) => k -> v.schema }, spark)
      .collect().map(r => r.getString(0) -> r).toMap
    val stg = report("stg_p")
    assert(stg.getString(1) == "OK")
    assert(stg.getString(2) == "MOVED:stg_p->stg_p_v2", stg.toString)
    assert(stg.getLong(4) == 1 && stg.getLong(5) == 0 && stg.getLong(6) == 1,
      stg.toString) // +build_id, id retyped
    assert(stg.getLong(7) == 2, stg.toString) // partition_by + cluster_by
    assert(stg.getString(8).contains("partition_by:->status") &&
      stg.getString(8).contains("cluster_by:->id"), stg.toString)
    val neu = report("mart_new")
    assert(neu.getString(1) == "NEW_MODEL")
    assert(neu.getString(3) == "", neu.toString) // no prod side to diff
    assert(report("mart_t").getString(3) == "table->view",
      report("mart_t").toString)
    assert(report("mart_gone").getString(1) == "REMOVED")
    // no prod manifest → movement UNKNOWN, everything else still reports
    val blind = Diff.prSchemaDiff(prMan, None,
      prRes.map { case (k, v) => k -> v.schema }, Map.empty, spark)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(blind.values.forall(_ == "UNKNOWN"))
  }

  test("orphanedRelations: prod dirs not covered by the manifest surface; " +
       "schema-qualified relations and artifacts do not") {
    import graft.operators.Diff
    val orders = Tables.orders(spark, sf).limit(10)
    val dag = new Pipeline(Seq(
      Model("covered", Seq("orders"), TableMat(),
        in => in("orders").select(col("o_orderkey").as("id"))),
      Model("covered_sub", Seq("orders"), TableMat(),
        in => in("orders").select(col("o_orderkey").as("id")),
        schemaOverride = Some("staging"))))
    val dir = tmp()
    val res = dag.run(spark, Map("orders" -> orders), dir)
    // an operator table nobody's model accounts for, plus a stray inside
    // the schema dir, plus run artifacts that must never count as orphans
    orders.write.parquet(s"$dir/legacy_mart")
    orders.write.parquet(s"$dir/staging/legacy_stg")
    dag.writeDocs(dir, res)
    assert(Diff.orphanedRelations(dir, dag.manifestJson(res)) ==
      Seq("legacy_mart", "staging/legacy_stg"))
  }
}
