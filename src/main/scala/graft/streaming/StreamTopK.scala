package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy-hitter tokens — the streaming twin of the batch
  * `sketch_topk_tokens` operator, with the same Misra-Gries summary as its
  * core.
  *
  * Topology: tokens shard by deterministic hash (ALL occurrences of a
  * token land in one shard, so a token's full mass is visible to exactly
  * one sketch), and each shard maintains a k-counter Misra-Gries summary
  * in `mapGroupsWithState`. State per shard is ≤ k (token, counter) pairs
  * + one long — O(shards·k), INDEPENDENT of stream length; parallelism is
  * the shard count. Every micro-batch emits each touched shard's current
  * summary (Update mode); the global heavy-hitter set is the union of
  * shard candidates (a tiny driver-side merge, ≤ shards·k rows).
  *
  * Guarantee (spec-asserted): within a shard that processed n tokens, any
  * token with count > n/(k+1) is guaranteed a candidate — so globally,
  * any token with count > N/(k+1) survives (its shard's n ≤ N), and the
  * per-shard bound is in fact ~shards× tighter for balanced shards.
  * Counters are LOWER bounds on true counts (each decrement round removes
  * at most one occurrence's worth per token), undercounting by at most
  * n/(k+1) — the classic Misra-Gries deterministic bounds, no
  * distributional assumptions. Exact counts for the shortlist come from a
  * second exact aggregation over candidates only (how the batch twin
  * confirms), never a full token-frequency shuffle.
  */
object StreamTopK {

  /** One shard's current Misra-Gries summary: `n` tokens processed,
    * `tokens` = candidate → lower-bound counter (≤ k entries). */
  case class ShardSketch(shard: Int, n: Long, tokens: Map[String, Long])

  /** Public (not private) so the state Encoder's generated code can reach
    * the constructor/accessors. */
  case class MgState(n: Long, counters: Map[String, Long])

  /** Deterministic token shard: non-negative, stable across JVMs (String
    * hashCode is specified by the JLS). */
  def shardOf(token: String, shards: Int): Int =
    math.floorMod(token.hashCode, shards)

  /** `tokens`: a streaming (or batch) DataFrame with a string `token`
    * column. Emits each touched shard's updated summary per micro-batch
    * (Update mode). */
  def heavyHitters(tokens: DataFrame, k: Int = 64, shards: Int = 8): Dataset[ShardSketch] = {
    val s = tokens.sparkSession
    import s.implicits._
    tokens
      .select(col("token").cast("string"))
      .as[String]
      .groupByKey(shardOf(_, shards))
      .mapGroupsWithState[MgState, ShardSketch](GroupStateTimeout.NoTimeout) {
        (shard, it, state: GroupState[MgState]) =>
          var n = state.getOption.map(_.n).getOrElse(0L)
          val m = scala.collection.mutable.Map.empty[String, Long]
          state.getOption.foreach(st => m ++= st.counters)
          it.foreach { t =>
            n += 1
            m.get(t) match {
              case Some(c) => m(t) = c + 1
              case None if m.size < k => m(t) = 1L
              case None => // decrement-all round: the O(k) amortized step
                m.mapValuesInPlace((_, c) => c - 1)
                m.filterInPlace((_, c) => c > 0)
            }
          }
          val st = MgState(n, m.toMap)
          state.update(st)
          ShardSketch(shard, st.n, st.counters)
      }
  }

  /** Output mode the stateful operator requires. */
  val outputMode: OutputMode = OutputMode.Update()
}
