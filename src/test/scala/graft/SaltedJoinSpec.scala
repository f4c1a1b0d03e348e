package graft

import graft.operators.SaltedJoin
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join is row-identical to the plain join on skewed data") {
    // 90% of fact rows share one key — the classic hot-key shape
    val fact = (1 to 2000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i)).toDF("k", "v")
    val dim = Seq(("hot", "H"), ("k0", "A"), ("k3", "B")).toDF("k", "tag")

    val plain = fact.join(dim, "k").select($"k", $"v", $"tag")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).sorted
    val salted = SaltedJoin(fact, dim, "k", salts = 8, saltSource = Seq("v"))
      .select($"k", $"v", $"tag")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).sorted
    assert(plain.sameElements(salted))

    // the hot key actually spreads across salt buckets
    val spread = fact.withColumn("__salt", pmod(hash($"v"), lit(8)))
      .filter($"k" === "hot").select($"__salt").distinct().count()
    assert(spread > 4)
  }
}
