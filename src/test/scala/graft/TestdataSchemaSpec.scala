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
}
