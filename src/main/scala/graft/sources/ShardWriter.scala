package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard materialization: writes the corpus in the packed layout
  * [[graft.operators.Curation.pipelineShardManifest]] describes —
  * `data/lang=…/source=…/shard_no=…/` parquet directories of
  * ~shard-size-token document groups, plus the manifest itself at
  * `_manifest/` — the publish step a 100 TB shard build runs after
  * curation.
  *
  * Properties the layout guarantees (spec-asserted):
  *  - assignment is deterministic (in-order packing over doc_id with
  *    md5-free integer arithmetic), so a retried/rerun build overwrites
  *    with byte-identical content instead of diverging;
  *  - the manifest agrees with the data exactly (same single plan
  *    computes both — the manifest is an aggregate OVER the assignment,
  *    not a second bookkeeping pass that could drift);
  *  - readers prune by any manifest dimension: `lang`/`source`/`shard_no`
  *    are partition columns, so "read shard 3 of (en, web)" touches one
  *    directory.
  */
object ShardWriter {

  /** Write the sharded corpus + manifest; returns the manifest DataFrame
    * (re-read from disk, so callers see exactly what was published). */
  def write(s: SparkSession, d: String, outDir: String,
      shardTokens: Int = graft.operators.Curation.ShardTokens): DataFrame = {
    val assigned = graft.operators.Curation.shardAssignment(s, d, shardTokens)
      .select(col("doc_id"), col("lang"), col("source"), col("shard_no"),
        col("n_tokens"), col("text"))
    assigned.write
      .mode("overwrite")
      .partitionBy("lang", "source", "shard_no")
      .parquet(s"$outDir/data")
    assigned
      .groupBy(col("lang"), col("source"), col("shard_no"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .write.mode("overwrite").parquet(s"$outDir/_manifest")
    s.read.parquet(s"$outDir/_manifest")
  }
}
