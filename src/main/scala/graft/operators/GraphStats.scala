package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-shape statistics over an undirected edge list (canonical
  * `a < b` pairs — exactly what the near-dup machinery emits):
  * triangle count and global clustering coefficient, the structural
  * health probe of a similarity graph (a dedup pair list whose
  * transitivity collapses is mostly LSH noise; one that triangulates
  * densely is genuine duplicate clusters).
  *
  * The triangle join is DEGREE-ORIENTED (each edge directed from its
  * lower-(degree, id) endpoint), the standard distributed-triangle
  * trick: the wedge fan-out from any vertex is bounded by its
  * out-degree, and orienting by degree caps Σ outdeg² at O(m^1.5)
  * even on power-law graphs — a hub with degree d contributes d
  * wedges as the CHEAP endpoint of its edges, never d², where the
  * naive low-id orientation explodes on hubs that happen to have
  * small ids. Every stage is an equi-join or keyed aggregate; nothing
  * is ever all-pairs.
  */
object GraphStats {

  /** One row of global stats for the `(aCol, bCol)` edge list:
    * vertex/edge/wedge/triangle counts plus the global clustering
    * coefficient 3·triangles / wedges (a small-int IEEE division —
    * bit-identical across engines; NULL when the graph has no
    * wedges). Input edges are deduped and self-loops dropped, so a
    * sloppy pair list cannot inflate the counts. */
  def triangleStats(edges: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val e = CacheRegistry.tracked(edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct())
    val deg = CacheRegistry.tracked(e.select(col("a").as("v"))
      .unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d")))
    // orient each edge from its lower-(degree, id) endpoint
    val dir = CacheRegistry.tracked(e
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("u"), col("b").as("w"), col("db").as("dw")))
          .otherwise(struct(col("b").as("u"), col("a").as("w"),
            col("da").as("dw"))).as("o"))
      .select(col("o.u"), col("o.w"), col("o.dw")))
    // wedges at each source u: out-neighbor pairs in orientation
    // order, closed into triangles by the (v, w) directed edge —
    // which, both being out-neighbors of u, can only run v→w
    val x = dir.select(col("u"), col("w").as("v1"), col("dw").as("d1"))
    val y = dir.select(col("u"), col("w").as("v2"), col("dw").as("d2"))
    val tri = x.join(y, Seq("u"))
      .filter(struct(col("d1"), col("v1")) < struct(col("d2"), col("v2")))
      .join(dir.select(col("u").as("v1"), col("w").as("v2")),
        Seq("v1", "v2"))
      .agg(count(lit(1)).as("n_triangles"))
    val counts = e.agg(count(lit(1)).as("n_edges"))
    val vw = deg.agg(count(lit(1)).as("n_vertices"),
      coalesce(sum((col("d") * (col("d") - 1L) / lit(2L)).cast("long")),
        lit(0L)).as("n_wedges")) // empty graph: 0 wedges, not NULL
    vw.crossJoin(broadcast(counts)).crossJoin(broadcast(tri))
      .select(col("n_vertices"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0L,
          lit(3L) * col("n_triangles").cast("double") / col("n_wedges"))
          .as("transitivity"))
  }
}
