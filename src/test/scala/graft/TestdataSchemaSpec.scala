package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drift guard for the driver-generated fixtures under /root/testdata.
  *
  * The driver regenerates the parquet tables between rounds and has
  * changed column types before (r11: `events.ts` went from epoch-millis
  * BIGINT to timestamp[us] / TIMESTAMP_NTZ, breaking three streaming
  * specs with opaque analysis errors). This spec pins every table's
  * column names and Spark-side types so the NEXT drift fails here, with
  * a readable message naming the table and the exact diff, instead of
  * deep inside an unrelated spec.
  *
  * If this spec fails: the testdata schema changed — update EXPECTED
  * below AND audit every consumer of the changed column (grep the
  * column name across src/) the way Streams.eventTs dispatches on type.
  */
class TestdataSchemaSpec extends AnyFunSuite {

  private val EXPECTED: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey:int", "r_name:string"),
    "nation" -> Seq("n_nationkey:int", "n_name:string", "n_regionkey:int"),
    "customer" -> Seq("c_custkey:bigint", "c_name:string", "c_nationkey:int",
      "c_acctbal:double", "c_mktsegment:string"),
    "supplier" -> Seq("s_suppkey:bigint", "s_name:string", "s_nationkey:int",
      "s_acctbal:double"),
    "part" -> Seq("p_partkey:bigint", "p_name:string", "p_brand:string",
      "p_type:string", "p_size:int", "p_retailprice:double"),
    "orders" -> Seq("o_orderkey:bigint", "o_custkey:bigint", "o_orderstatus:string",
      "o_totalprice:double", "o_orderdate:timestamp_ntz", "o_orderpriority:string"),
    "lineitem" -> Seq("l_orderkey:bigint", "l_partkey:bigint", "l_suppkey:bigint",
      "l_linenumber:int", "l_quantity:double", "l_extendedprice:double",
      "l_discount:double", "l_tax:double", "l_returnflag:string",
      "l_linestatus:string", "l_shipdate:timestamp_ntz"),
    "events" -> Seq("event_id:bigint", "ts:timestamp_ntz", "user_id:bigint",
      "event_type:string", "value:double", "props:string"),
    "documents" -> Seq("doc_id:bigint", "text:string", "lang:string",
      "source:string", "n_chars:bigint"),
    "embeddings" -> Seq("vec_id:bigint", "embedding:array<float>", "label:int")
  )

  for ((table, expected) <- EXPECTED.toSeq.sortBy(_._1)) {
    test(s"fixture table '$table' has the pinned schema") {
      val actual = SparkT.table(table).schema.fields.toSeq
        .map(f => s"${f.name}:${f.dataType.simpleString}")
      assert(actual == expected,
        s"\nTESTDATA SCHEMA CHANGED for '$table' — the driver regenerated " +
          s"/root/testdata with a different shape.\n  expected: ${expected.mkString(", ")}\n" +
          s"  actual:   ${actual.mkString(", ")}\n" +
          "Update TestdataSchemaSpec AND audit every consumer of the changed column.")
    }
  }

  // ---- content invariants (r12 verdict task #7): the semantic
  // assumptions the operator suite rests on, pinned so a CONTENT drift
  // (not just a shape change) also fails here with a named cause
  // instead of deep inside an unrelated spec. Each is one cheap scan
  // of the sf0.001 fixture.

  import org.apache.spark.sql.functions._

  test("fixture content: events.ts and events.user_id are never null") {
    // Streams.eventTs / sessionization assume a present event time and
    // a groupable user key on every row
    val bad = SparkT.table("events")
      .filter(col("ts").isNull || col("user_id").isNull).count()
    assert(bad == 0, s"$bad events rows with null ts/user_id")
  }

  test("fixture content: documents.doc_id is unique and text non-null") {
    // every dedup oracle treats doc_id as the identity; a duplicated
    // key would silently change pair counts everywhere
    val docs = SparkT.table("documents")
    val n = docs.count(); val d = docs.select("doc_id").distinct().count()
    assert(n == d, s"documents.doc_id not unique: $n rows, $d distinct")
    assert(docs.filter(col("text").isNull).count() == 0, "null documents.text")
  }

  test("fixture content: embeddings are fixed-dim, non-null, unique ids") {
    // Ann assumes one fixed dimensionality (its kernels unroll over it)
    // and unique vec_ids (top-k identity)
    val emb = SparkT.table("embeddings")
    val dims = emb.select(size(col("embedding")).as("d")).distinct()
      .collect().map(_.getInt(0)).toSeq
    assert(dims.length == 1 && dims.head > 0, s"embedding dims not fixed: $dims")
    assert(emb.filter(col("embedding").isNull).count() == 0, "null embedding")
    val n = emb.count(); val d = emb.select("vec_id").distinct().count()
    assert(n == d, s"embeddings.vec_id not unique: $n rows, $d distinct")
  }

  test("fixture content: lineitem join keys resolve against orders") {
    // the TPC-H-ish queries assume referential integrity l_orderkey →
    // o_orderkey (q16/q17 would silently lose rows otherwise)
    val orphans = SparkT.table("lineitem").select(col("l_orderkey"))
      .except(SparkT.table("orders").select(col("o_orderkey"))).count()
    assert(orphans == 0, s"$orphans lineitem orderkeys missing from orders")
  }

  test("fixture content: lineitem.l_quantity positive, l_discount in [0,1]") {
    // quantile/skew stress paths build exact integer-valued doubles
    // from l_quantity; the TPC-H revenue forms assume discount is a
    // fraction
    val bad = SparkT.table("lineitem")
      .filter(col("l_quantity") <= 0 ||
        col("l_discount") < 0 || col("l_discount") > 1).count()
    assert(bad == 0, s"$bad lineitem rows violate quantity/discount ranges")
  }
}
