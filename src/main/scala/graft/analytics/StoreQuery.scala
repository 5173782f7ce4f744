package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.FilterDsl

/** Offline analytics over the crawl's docs store — the Spark replacement of
  * the reference's `ParallelFilteredProcessorRunner` pipeline (scan →
  * filter DSL → processor projection → ordered writer, SURVEY.md §3.3) and
  * its downstream tools. Scan parallelism, predicate evaluation, and the
  * ordered sink (the bespoke ReorderingBlockingQueue,
  * `warc/util/ReorderingBlockingQueue.java:26-36`) are all Catalyst-native:
  * splittable parquet scan + `where` + `orderBy`. */
object StoreQuery {

  /** docs-store filter context: which columns the DSL atoms read. */
  def docsContext(docs: DataFrame): FilterDsl.FilterContext = {
    val textOfSpans = array_join(
      transform(filter(col("spans"), s => s.getField("kind") === "text"),
        s => s.getField("text")), " ")
    FilterDsl.FilterContext(
      url = Some(col("doc_id")),
      scheme = Some(graft.functions.burl_scheme(col("doc_id"))),
      host = Some(graft.functions.burl_host(col("doc_id"))),
      path = Some(graft.functions.burl_path(col("doc_id"))),
      pathQuery = Some(graft.functions.burl_path_query(col("doc_id"))),
      status = Some(col("status")),
      digest = Some(col("digest")),
      text = Some(textOfSpans),
      isHttpResponse = Some(lit(true)))
  }

  /** Scan → DSL filter → projection, in store order (round, then doc_id):
    * the `ParallelFilteredProcessorRunner.main` equivalent. */
  def scan(docs: DataFrame, dsl: String, projections: Seq[String]): DataFrame =
    docs.where(FilterDsl.compile(dsl, docsContext(docs)))
      .select(projections.map(col): _*)
      .orderBy("round", "doc_id")

  /** url · digest · status · length projection
    * (`URLDigestStatusLengthWriter.java:30-37`). */
  def urlDigestStatusLength(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("digest"), col("status"),
      aggregate(transform(col("spans"), s => length(s.getField("text"))),
        lit(0), (acc, x) => acc + x).as("text_length"))

  /** duplicate → archetype resolution: for every doc, the doc_id of the
    * FIRST doc with the same digest (`URLDigestFinalPositionWriter.java:31`,
    * `GenerateGraphMap.java:40-48`). Aggregation-based (skew-immune). */
  def archetypes(docs: DataFrame): DataFrame = {
    val firsts = docs.groupBy("digest")
      .agg(min(struct(col("round"), col("doc_id"))).as("__first"))
    docs.join(firsts, Seq("digest"))
      .select(col("doc_id"), col("digest"),
        col("__first.doc_id").as("archetype"),
        (col("doc_id") =!= col("__first.doc_id")).as("is_duplicate_of_archetype"))
  }

  /** The graph map (`GenerateGraphMap.java:40-90`): every stored URL ->
    * dense node id, where non-duplicate docs (archetypes) get their own
    * node and duplicates map to their archetype's node. Node ids are
    * dense ranks of the archetypes in store order (round, doc_id),
    * assigned with the deterministic bucketed two-phase rank (round is a
    * monotone prefix of the order — no global window, no sampling). */
  def graphMap(docs: DataFrame): DataFrame = {
    val arch = docs.where(!col("is_duplicate"))
      .select(col("round"), col("doc_id"), col("digest"))
    val (ranked, _) = graft.frontier.Sieve.assignSeq(
      arch, Seq("round", "doc_id"), startSeq = -1L, bucket = col("round"))
    val nodes = ranked.select(col("digest"), col("doc_id").as("archetype_url"),
      col("seq").as("node"))
    docs.select(col("doc_id").as("url"), col("digest"))
      .join(nodes, Seq("digest"))
      .select(col("url"), col("node"), col("archetype_url"))
  }

  /** URLs stored more than once across the crawl
    * (`BuildRepetitionSet.java:30-38`). */
  def repetitionSet(docs: DataFrame): DataFrame =
    docs.groupBy("doc_id").agg(count(lit(1)).as("n_stored"),
        collect_list(col("round")).as("rounds"))
      .where(col("n_stored") > 1)

  /** (src, dst) host-level link graph from the media refs in spans — the
    * CatEFGraphs-style edge extraction over the store. */
  def mediaEdges(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(filter(col("spans"), s => s.getField("kind") === "media")).as("m"))
      .select(graft.functions.burl_host(col("doc_id")).as("src_host"),
        graft.functions.burl_host(col("m.media_ref")).as("dst_host"))
      .where(col("dst_host").isNotNull)
      .groupBy("src_host", "dst_host").count()
}
