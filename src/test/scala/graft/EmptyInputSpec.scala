package graft

import org.apache.spark.sql.functions._
import graft.pipelines._

/** Pipelines must be total on empty inputs (a real condition at scale:
  * an empty partition, a filter that drops everything, a new tenant). */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private val noOrders = Seq.empty[(String, String, String)]
    .toDF("order_id", "customer_id", "order_date")
    .withColumn("order_date", to_timestamp(col("order_date")))
  private val noItems = Seq.empty[(String, String, String, Int, Double, Double)]
    .toDF("order_id", "product_id", "supplier_id", "line_number", "quantity", "unit_price")
  private val noProducts = Seq.empty[(String, String, String, Double, Double)]
    .toDF("product_id", "product_name", "category", "price", "margin_percentage")

  test("sales pipeline on empty inputs yields an empty, well-typed frame") {
    val out = SalesRevenue.run(noOrders, noItems, noProducts)
    assert(out.count() == 0)
    assert(out.columns.contains("line_total"))
  }

  test("marketing pipeline on empty input") {
    val empty = Seq.empty[(Long, Long, String, String, String, Int, Int, Int, Double, Double)]
      .toDF("event_id", "campaign_id", "campaign_name", "channel", "date",
        "impressions", "clicks", "conversions", "spend", "revenue_generated")
      .withColumn("date", to_timestamp(col("date")))
    assert(MarketingRoi.run(empty).count() == 0)
  }

  test("area metrics on empty enrichment") {
    val empty = Seq.empty[(String, String, Int, String, Int)]
      .toDF("feedback_id", "area", "rating", "sentiment_normalized", "sentiment_score")
    assert(CustomerFeedback.areaMetrics(empty).count() == 0)
  }

  test("text/dedup/ANN operators are total on empty documents + embeddings") {
    import graft.llm.{Curation, Dedup, Multimodal, Similarity, TextAnalysis}
    // an empty-fixture dir with the real schemas (a new tenant's corpus)
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_sf").toString
    Seq("documents", "embeddings", "events", "nation", "customer",
      "supplier", "orders", "lineitem").foreach { t =>
      spark.read.parquet(s"$sfTiny/$t.parquet").limit(0)
        .write.parquet(s"$dir/$t.parquet")
    }
    val ops: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "text_stats" -> (TextAnalysis.textStats _),
      "text_bpe_tokens" -> (TextAnalysis.bpeTokens _),
      "text_top_terms" -> (TextAnalysis.topTerms _),
      "text_pii_scan" -> (TextAnalysis.piiScan _),
      "doc_chunks" -> (Curation.docChunks _),
      "corpus_split" -> (Curation.sampleSplit _),
      "doc_pack_sequences" -> (Curation.packSequences _),
      "corpus_mix_weights" -> (Curation.mixWeights _),
      "corpus_embedding_coverage" -> (Curation.embeddingCoverage _),
      "corpus_epoch_plan" -> (Curation.epochPlan _),
      "corpus_training_manifest" -> (Curation.trainingManifest _),
      "text_oov_rate" -> (TextAnalysis.oovRate _),
      "dedup_canonical_quality" -> (Dedup.canonicalByQuality _),
      "dedup_rate_by_source" -> (Dedup.dupRateBySource _),
      "dedup_containment_pairs" -> (Dedup.containmentPairs _),
      "doc_chunk_boilerplate" -> (Curation.chunkBoilerplate _),
      "text_term_spectrum" -> (TextAnalysis.termSpectrum _),
      "text_length_quantiles" -> (TextAnalysis.lengthQuantiles _),
      "corpus_curated" -> (Curation.curatedCorpus _),
      "dedup_exact" -> (Dedup.exactDedup _),
      "dedup_minhash_pairs" -> (Dedup.minhashPairs _),
      "dedup_clusters" -> (Dedup.dedupClusters _),
      "corpus_deduped" -> (Dedup.dedupedCorpus _),
      "dedup_edit_distance" -> (Dedup.editDistancePairs _),
      "ann_cosine_topk" -> (Similarity.cosineTopK _),
      "ann_pq_codes" -> (Similarity.pqCodes _),
      "ann_pq_adc_topk" -> (Similarity.pqAdcTopK _),
      "ann_ivf_kmeans_step" -> (Similarity.ivfKmeansStep _),
      "ann_ivf_kmeans_refined" -> (Similarity.ivfKmeansRefined _),
      "ann_ivf_topk_refined" -> (Similarity.ivfTopKRefined _),
      "dedup_incremental" -> (Dedup.incrementalDedup _),
      "dedup_cluster_sizes" -> (Dedup.dedupClusterSizes _),
      "multimodal_pixel_stats" -> (Multimodal.pixelStats _),
      "multimodal_wav_stats" -> (Multimodal.wavStats _),
      "multimodal_video_stats" -> (Multimodal.videoStats _),
      "text_vocabulary" -> (TextAnalysis.vocabulary _),
      "text_contamination" -> (TextAnalysis.contamination _),
      "text_tfidf_pairs" -> (TextAnalysis.tfidfPairs _),
      // round-6 operators
      "text_bigram_lm" -> (graft.llm.LanguageModel.bigramScore _),
      "text_bpe_merge_step" -> (graft.llm.LanguageModel.bpeMergeStep _),
      "text_bpe_train" -> (graft.llm.LanguageModel.bpeTrain _),
      "text_bpe_encode" -> (graft.llm.LanguageModel.bpeEncode _),
      "text_posting_lists" -> (graft.llm.LanguageModel.postingLists _),
      "corpus_weighted_sample" -> (Curation.weightedSample _),
      "doc_cdc_chunks" -> (graft.llm.Chunking.cdcChunks _),
      "doc_cdc_shared" -> (graft.llm.Chunking.cdcSharedChunks _),
      "dedup_prefix_filter_pairs" -> (graft.llm.PrefixJoin.prefixFilterPairs _),
      "multimodal_ahash" -> (Multimodal.pixelAhash _),
      // round-7 operators
      "dedup_prefix_filter_topk" -> (graft.llm.PrefixJoin.prefixFilterTopK _),
      "text_tfidf_topk" -> (TextAnalysis.tfidfTopKPartners _),
      "dedup_duplicate_spans" -> (graft.llm.Spans.duplicateSpans _),
      "doc_dup_span_coverage" -> (graft.llm.Spans.dupSpanCoverage _),
      "doc_dup_span_intervals" -> (graft.llm.Spans.dupSpanIntervals _),
      "dedup_incremental_spans" -> (graft.llm.Spans.incrementalSpans _),
      "ann_ivfpq_topk" -> (graft.llm.Similarity.ivfPqTopK _),
      "text_quality_gate" -> (TextAnalysis.qualityGate _),
      "lineitem_promo_uplift" -> (graft.ops.RangeJoin.promoUplift _),
      "ann_incremental_assign" -> (Similarity.incrementalAssign _),
      "dedup_kcore" -> (graft.sql.Graph.docKcore _),
      // empty EVENT/GRAPH inputs: the sketch has no heavy hitters to
      // audit, and a graph with no nodes ranks nothing (the teleport
      // division by a zero node count stays on the never-executed
      // per-node path — non-ANSI DIV NULL, zero rows, no crash)
      "events_cms_heavy_hitters" -> (graft.ops.Sketches.cmsHeavyHitters _),
      "nation_pagerank" -> (graft.sql.Graph.nationPagerank _))
    ops.foreach { case (name, fn) =>
      assert(fn(spark, dir).count() == 0, s"$name not empty/total on empty input")
    }
    // non-zero-but-total cases: the normalization query carries its
    // own 5-doc side corpus, and the recall report always emits one
    // row per tier (counts zeroed, recall 0.0 — never null/NaN)
    assert(TextAnalysis.normalized(spark, dir).count() == 5)
    // the funnel is a report: six stage rows even over an empty
    // corpus, counts zeroed, share NULL (guarded 0/0)
    val funnel = Curation.qualityFunnel(spark, dir)
      .select("stage", "n_docs", "n_tokens").as[(Int, Long, Long)].collect()
    assert(funnel.toSeq == (0 to 5).map(k => (k, 0L, 0L)))
    val recall = Similarity.annRecall(spark, dir)
      .select("tier", "n_true", "n_hit", "recall_at_k")
      .as[(String, Long, Long, Double)].collect()
    assert(recall.length == 4)
    recall.foreach { case (_, nt, nh, r) =>
      assert(nt == 0 && nh == 0 && r == 0.0)
    }
    val pqRecall = Similarity.pqRecall(spark, dir)
      .select("tier", "n_true", "n_hit", "recall_at_k")
      .as[(String, Long, Long, Double)].collect()
    assert(pqRecall.toSeq == Seq(
      ("ivfpq_adc", 0L, 0L, 0.0), ("pq_adc", 0L, 0L, 0.0)))

    // continuation-session operators: zero-row totality
    val ops2: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "embedding_int8_quant" -> (graft.llm.Quantize.int8Quant _),
      "embedding_random_projection" -> (graft.llm.Quantize.randomProjection _),
      "embedding_projection_audit" -> (graft.llm.Quantize.projectionAudit _),
      "ann_binary_topk" -> (graft.llm.Quantize.binaryTopK _),
      "ann_matryoshka_recall" -> (graft.llm.Quantize.matryoshkaRecall _),
      "text_skipgram_pmi" -> (TextAnalysis.skipgramPmi _),
      "text_dsir_weights" -> (TextAnalysis.dsirWeights _),
      "text_sentences" -> (TextAnalysis.sentences _),
      "text_char_diversity" -> (TextAnalysis.charDiversity _),
      "text_doc_keywords" -> (TextAnalysis.docKeywords _),
      "text_term_burstiness" -> (TextAnalysis.termBurstiness _),
      "text_ttr_by_length" -> (TextAnalysis.ttrByLength _),
      "events_sliding_distinct" -> (graft.ops.Sketches.slidingDistinct _),
      "events_stickiness" -> (graft.ops.Sketches.stickiness _),
      "events_bot_score" -> (graft.streaming.EventsStream.botScore _),
      "events_markov_stationary" -> (graft.streaming.EventsStream.markovStationary _),
      "events_top_paths" -> (graft.streaming.Sessionize.topPaths _),
      "corpus_quality_calibrated" -> (Curation.qualityCalibrated _),
      "corpus_shard_plan" -> (Curation.shardPlan _),
      "corpus_split_leakage" -> (graft.llm.Spans.splitLeakage _),
      "cluster_top_terms" -> (graft.llm.Retrieval.clusterTopTerms _),
      "retrieval_rrf_fusion" -> (graft.llm.Retrieval.rrfFusion _),
      "dedup_clustering_coeff" -> (Dedup.clusteringCoeff _),
      "dedup_semantic_clusters" -> (Similarity.semanticClusters _),
      "multimodal_pixel_histogram" -> (Multimodal.pixelHistogram _),
      "multimodal_hist_similarity" -> (Multimodal.histSimilarity _),
      "multimodal_ahash_pairs" -> (Multimodal.ahashPairs _),
      "multimodal_motion_energy" -> (Multimodal.motionEnergy _),
      "nation_bfs_hops" -> (graft.sql.Graph.nationBfsHops _))
    ops2.foreach { case (name, fn) =>
      assert(fn(spark, dir).count() == 0, s"$name not empty/total on empty input")
    }
    // report-shaped continuation operators: fixed row counts with
    // zeroed/guarded values over an empty corpus
    assert(Curation.chopBoundaries(spark, dir)
      .select("n_docs").as[Long].collect().forall(_ == 0L))
    assert(Curation.budgetPlanner(spark, dir)
      .select("docs_kept").as[Long].collect().forall(_ == 0L))
    val f2 = Curation.funnelV2(spark, dir)
      .select("stage", "n_docs").as[(Int, Long)].collect()
    assert(f2.toSeq == (0 to 4).map(k => (k, 0L)))
    assert(Dedup.lshRecall(spark, dir)
      .selectExpr("n_truth", "recall").as[(Long, Double)].head() == ((0L, 1.0)))
    assert(Dedup.clusterAri(spark, dir)
      .selectExpr("n", "ari").as[(Long, Double)].head() == ((0L, 0.0)))
  }
}
