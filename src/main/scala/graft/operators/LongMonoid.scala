package graft.operators

/** Associative aggregate the sliding window is generic over.
  *
  * The reference hard-codes 32-bit integer SUM at four `// Aggregation point`
  * sites (`/root/reference/src/SlidingAggregation.java:301-302,361-364,
  * 373-374,407-408`), overflowing on large windows. We generalize to any
  * monoid over Long and accumulate in 64 bits.
  *
  * `invert` is defined for group-like aggregates (sum/count) and enables
  * O(1) prefix-difference window evaluation; idempotent aggregates (min/max)
  * use an O(1) sparse-table range query instead (see [[SlidingAggregate]]).
  */
sealed trait LongMonoid extends Serializable {
  def zero: Long
  def combine(a: Long, b: Long): Long
  /** Some((a,b) => a "minus" b) when (Long, combine) forms a group. */
  def invert: Option[(Long, Long) => Long] = None
  /** combine(a, a) == a — allows overlapping range decomposition. */
  def idempotent: Boolean = false
  /** Maps the raw input value into the monoid (identity except Count). */
  def lift(v: Long): Long = v
  def name: String
}

object LongMonoid {
  case object Sum extends LongMonoid {
    val zero = 0L
    def combine(a: Long, b: Long): Long = a + b
    override val invert: Option[(Long, Long) => Long] = Some(_ - _)
    val name = "sum"
  }
  case object Count extends LongMonoid {
    val zero = 0L
    def combine(a: Long, b: Long): Long = a + b
    override val invert: Option[(Long, Long) => Long] = Some(_ - _)
    override def lift(v: Long): Long = 1L
    val name = "count"
  }
  case object Min extends LongMonoid {
    val zero = Long.MaxValue
    def combine(a: Long, b: Long): Long = math.min(a, b)
    override val idempotent = true
    val name = "min"
  }
  case object Max extends LongMonoid {
    val zero = Long.MinValue
    def combine(a: Long, b: Long): Long = math.max(a, b)
    override val idempotent = true
    val name = "max"
  }

  def byName(s: String): LongMonoid = s match {
    case "sum"   => Sum
    case "count" => Count
    case "min"   => Min
    case "max"   => Max
    case other   => throw new IllegalArgumentException(s"unknown aggregate: $other")
  }
}
