package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial bucketing — the 2-D analogue of the LSH band join: a radius
  * join over points in a plane must never compare all pairs, so space
  * is cut into `cellSize` grid cells and each query probes only its
  * 3×3 cell neighborhood (every point within `radius ≤ cellSize` of
  * the query provably lands there). Distances are INTEGER squared
  * euclidean — no floats anywhere, so engines can't disagree.
  */
object Spatial {

  /** All (query, point) pairs within `radius` (euclidean, ≤), excluding
    * the self-pair. `points`/`queries` carry (id, x, y) with integral
    * coordinates.
    *
    * Plan shape at 100 TB: points shuffle once on their single home
    * cell; queries fan out 9× (narrow explode of a literal offset
    * array) and shuffle on the probed cell — the join's candidate
    * volume is Σ over cells of |queries probing c|·|points in c|,
    * bounded by local density like every good blocking scheme, never
    * |Q|·|P|. The exact dist² ≤ r² verify runs join-side, so far pairs
    * die inside the join without materializing.
    */
  def gridRadiusJoin(points: DataFrame, queries: DataFrame,
      id: Column, x: Column, y: Column,
      radius: Long, cellSize: Long): DataFrame = {
    require(radius >= 0 && cellSize > 0,
      s"gridRadiusJoin: need radius ≥ 0 and cellSize > 0, got " +
        s"radius=$radius cellSize=$cellSize (cellSize 0 would null every " +
        "cell key and silently match nothing)")
    require(cellSize >= radius,
      s"gridRadiusJoin: cellSize ($cellSize) must be ≥ radius ($radius) " +
        "or the 3×3 neighborhood misses matches")
    val p = points.select(id.as("p_id"), x.cast("long").as("px"),
        y.cast("long").as("py"))
      .withColumn("cx", floor(col("px") / cellSize))
      .withColumn("cy", floor(col("py") / cellSize))
    val offsets = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy")))): _*)
    val q = queries.select(id.as("q_id"), x.cast("long").as("qx"),
        y.cast("long").as("qy"))
      .withColumn("o", explode(offsets))
      .withColumn("cx", floor(col("qx") / cellSize) + col("o.dx"))
      .withColumn("cy", floor(col("qy") / cellSize) + col("o.dy"))
      .drop("o")
    val d2 = (col("qx") - col("px")) * (col("qx") - col("px")) +
      (col("qy") - col("py")) * (col("qy") - col("py"))
    q.join(p, Seq("cx", "cy"))
      .filter(col("q_id") =!= col("p_id") && d2 <= radius * radius)
      .select(col("q_id"), col("p_id"), d2.as("dist2"))
  }
}
