package graft

import org.apache.spark.sql.SparkSession

/** Engine session defaults, adopted from MEASUREMENT (the r13 100M-edge
  * knee probe, PLANS.md round-13 addendum 2), not folklore:
  *
  *  - `spark.io.compression.codec = zstd` — halved bytes through the
  *    shuffle (8.43 → 4.68 GB) for a 1.7× wall win at 100M edges;
  *  - `spark.sql.shuffle.partitions = 2 × cores` — eliminated shuffle
  *    spill entirely (1.3× wall vs cores-sized partitions; 4× cores
  *    over-split and gave the win back to scheduling overhead).
  *
  * Both knobs were checksum-neutral in the probe (bit-identical results
  * across all knob settings), so they are pure performance defaults. On
  * a real cluster the same rule applies per executor: partitions ≈ 2 ×
  * total cores, sized so per-task shuffle state fits executor memory.
  *
  * Env overrides (A/B without a code edit):
  * `SPARK_GRAFT_SHUFFLE_PARTS` (absolute count) and `SPARK_GRAFT_CODEC`.
  */
object Sessions {

  /** The shuffle-partition default for `cpus` usable cores. */
  def shuffleParts(cpus: Int): Int =
    sys.env.get("SPARK_GRAFT_SHUFFLE_PARTS").map(_.toInt)
      .getOrElse(math.max(2, 2 * cpus))

  /** The shuffle/IO compression codec default. */
  def codec: String = sys.env.getOrElse("SPARK_GRAFT_CODEC", "zstd")

  /** Applies the measured engine defaults to a builder. */
  def tuned(b: SparkSession.Builder, cpus: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shuffleParts(cpus).toString)
      .config("spark.io.compression.codec", codec)
}
