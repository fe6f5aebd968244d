package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r13 (r12 verdict #7): the X122 sharded release writer exercised on
  * the SAME survivors the `q_release_dag` oracle certifies — proving
  * the bytes a release would physically ship and the manifest numbers
  * the 6-stage chained DuckDB oracle checks come from one DAG. The
  * spec writes the packed sequences with `Sinks.writeShardedCorpus`,
  * reads every shard file back from disk, re-derives the full
  * manifest (counts, token mass, id bounds, order-independent
  * checksum) from the physical data, and checks three-way parity:
  * written-manifest == re-derived-from-disk == the contract query's
  * result.
  */
class ReleaseDagWriterSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("writeShardedCorpus on the q_release_dag survivors: physical " +
    "layout, re-derived checksums, and the oracled manifest agree") {
    val s = spark
    import s.implicits._
    val packed = graft.queries.DedupQueries.releaseDagPacked(s, sfDir)
      .withColumn("source", lit("release"))
      .localCheckpoint(true) // writer + parity reads share one build
    val out = Files.createTempDirectory("releasewrite").toString
    val manifest = Sinks.writeShardedCorpus(packed, "source",
      "seq_id", "seq_text", graft.queries.CurationQueries.ManifestBudget,
      out)
    val manifestRows = manifest.orderBy($"source", $"shard_id")
      .collect().map(_.toSeq).toSeq
    assert(manifestRows.nonEmpty, "empty release: DAG produced no shards")

    // 1. the writer's manifest row-for-row equals the oracle-checked
    //    q_release_dag contract result
    val fromQuery = graft.queries.DedupQueries.defs
      .find(_.name == "q_release_dag").get.build(s, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(manifestRows == fromQuery,
      "writer manifest diverges from the oracled query result")

    // 2. physical layout: partition dirs exist for every manifest
    //    (source, shard) and nothing else
    val dataDir = new java.io.File(s"$out/data")
    val shardDirs = dataDir.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("source="))
      .flatMap(_.listFiles())
      .filter(f => f.isDirectory && f.getName.startsWith("shard_id="))
    assert(shardDirs.length == manifestRows.length,
      s"disk has ${shardDirs.length} shard dirs, manifest has " +
        s"${manifestRows.length}")
    assert(shardDirs.forall(_.listFiles()
      .exists(_.getName.endsWith(".parquet"))),
      "a shard directory holds no parquet file")

    // 3. read EVERY shard file back and re-derive the manifest from
    //    the bytes on disk: counts, token mass, id bounds, and the
    //    order-independent md5-head checksum over seq_text
    val back = s.read.parquet(s"$out/data").localCheckpoint(true)
    assert(back.count() == packed.count(),
      "row loss/duplication through the sharded write")
    assert(back.select($"seq_id").distinct().count() == back.count(),
      "duplicate seq_id on disk")
    val rederived = back
      .groupBy($"source", $"shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("n_tokens"),
        min($"seq_id").as("first_id"), max($"seq_id").as("last_id"),
        sum(conv(substring(md5($"seq_text"), 1, 8), 16, 10)
          .cast("long")).as("checksum"))
      .orderBy($"source", $"shard_id")
      .collect().map(_.toSeq).toSeq
    assert(rederived == manifestRows,
      "re-derived manifest from disk diverges from the written one")
  }
}
