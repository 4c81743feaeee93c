package graft

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for the key operators — the artifact
  * to check that scans prune columns, filters push down, and top-k
  * compiles to TakeOrderedAndProject inside WholeStageCodegen. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("vec_flat_cosine_topk", "vec_flat_packed_topk", "vec_funnel_topk",
        "vec_search_many", "ann_sq8_topk", "ann_ivfpq_topk",
        "ann_ivfpq_search_many", "ann_ivfpq_partitioned_search_many",
        "ann_ivf_partitioned_search_many", "ann_opq_topk",
        "ann_ivf_filtered_topk", "ann_hnsw_filtered_topk",
        "ann_hnsw_sharded_topk", "ann_hnsw_persisted_topk", "mm_resize",
        "agg_pricing_summary", "join_revenue_by_nation", "dedup_minhash_pairs",
        "text_contamination", "data_domain_cap", "data_stratified_sample",
        "vec_quantized_topk", "vec_quantized_search_many",
        "vec_funnel_search_many", "vec_hybrid_search_many",
        "data_cluster_mix", "text_hashing_tf", "dedup_tfvector_cosine",
        "text_bm25_topk", "hybrid_bm25_rrf", "dedup_semantic_pairs",
        "vec_range_cosine", "knn_graph_ivf_full", "text_nb_langid",
        "text_bigram_ppl", "emb_pca_covariance")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
