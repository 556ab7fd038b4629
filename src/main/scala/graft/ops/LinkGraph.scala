package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Host-graph link analysis — the crawl-side workload downstream of
  * [[Urls]]: edges are (source registered domain → target registered
  * domain) pairs extracted from raw link URLs, and the stats are the
  * degree/reciprocity signals crawl frontiers and spam filters run on.
  * Everything is counts (integer-exact oracles); every shuffle is keyed
  * by domain, reciprocity is one self-equi-join on the reversed pair —
  * nothing quadratic in the edge count. */
object LinkGraph {

  /** (src raw url, dst raw url) rows → canonical-domain edge list with
    * self-loops dropped (intra-domain links aren't graph edges). */
  def domainEdges(links: DataFrame, srcUrl: String, dstUrl: String): DataFrame = {
    def dom(c: Column) = Urls.registeredDomain(Urls.host(c))
    links.select(dom(col(srcUrl)).as("src"), dom(col(dstUrl)).as("dst"))
      .where(col("src") =!= col("dst"))
  }

  /** Per-domain degree + reciprocity stats over a (src, dst) edge list:
    * out_edges / in_edges count multi-edges, out_domains / in_domains are
    * distinct partners, recip_out counts this domain's outgoing DISTINCT
    * partner links that are returned by at least one reverse edge. */
  def domainStats(edges: DataFrame): DataFrame = {
    val distinctEdges = edges.select("src", "dst").distinct()
    val reciprocal = distinctEdges.as("e")
      .join(distinctEdges.select(col("src").as("dst"), col("dst").as("src")).as("r"),
        Seq("src", "dst"), "left_semi")
      .groupBy("src").agg(count(lit(1)).as("recip_out"))
    val out = edges.groupBy("src").agg(
      count(lit(1)).as("out_edges"),
      countDistinct("dst").as("out_domains"))
    val in = edges.select(col("dst").as("src"))
      .groupBy("src").agg(count(lit(1)).as("in_edges"))
    out.join(in, Seq("src"), "full")
      .join(reciprocal, Seq("src"), "left")
      .select(col("src").as("domain"),
        coalesce(col("out_edges"), lit(0L)).as("out_edges"),
        coalesce(col("out_domains"), lit(0L)).as("out_domains"),
        coalesce(col("in_edges"), lit(0L)).as("in_edges"),
        coalesce(col("recip_out"), lit(0L)).as("recip_out"))
  }
}
