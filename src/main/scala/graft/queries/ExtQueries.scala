package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Stable.{dsum, sqlDsum}
import graft.ops.{Chunking, Curation, Dedup, DedupIndex, EventWindows, Export, Multimodal, Salting, Sampling, Similarity, TextStats}
import graft.streaming.Streams

/** Extension surface (SURVEY.md §7.6 + the north-star mandate): dedup,
  * similarity search, text analysis, event-time windows — the operators a
  * large-scale training-data pipeline needs, expressed over `documents`,
  * `embeddings`, and `events`.
  *
  * Oracle policy: everything built from engine-neutral math (set algebra,
  * double folds, sha-256, regex) carries a DuckDB oracle; operators bound
  * to Spark-specific hashes (xxhash64/murmur LSH buckets) are rows-only
  * by the driver contract.
  */
object ExtQueries {


  import TextQueries._
  import DedupSampleQueries._
  import SimQueries._
  import MmQueries._
  import EventQueries._
  import WarehouseQueries._

  val defs: Seq[(String, QueryDef)] = Seq(
    "text_tokens" -> QueryDef(textTokens, Some(textTokensSql)),
    "text_chunks" -> QueryDef(textChunks, Some(textChunksSql)),
    "sample_weighted" -> QueryDef(sampleWeighted, Some(sampleWeightedSql)),
    "text_bpe_tokens" -> QueryDef(textBpeTokens, Some(textBpeTokensSql)),
    "text_quality" -> QueryDef(textQuality, Some(textQualitySql)),
    "text_langid" -> QueryDef(textLangid, Some(textLangidSql)),
    "text_fingerprint" -> QueryDef(textFingerprint, Some(textFingerprintSql)),
    "text_heavy_hitters" -> QueryDef(textHeavyHitters, Some(textHeavyHittersSql)),
    "text_gopher" -> QueryDef(textGopher, Some(textGopherSql)),
    "text_repetition" -> QueryDef(textRepetition, Some(textRepetitionSql)),
    "text_pii_scrub" -> QueryDef(textPiiScrub, Some(textPiiScrubSql)),
    "text_tfidf" -> QueryDef(textTfidf, Some(textTfidfSql)),
    "text_lm_score" -> QueryDef(textLmScore, Some(textLmScoreSql)),
    "text_funnel" -> QueryDef(textFunnel, Some(textFunnelSql)),
    "text_decontaminate" -> QueryDef(textDecontaminate, Some(textDecontaminateSql)),
    "text_decontam_bloom" -> QueryDef(textDecontaminateBloom, Some(textDecontaminateSql)),
    "text_report_card" -> QueryDef(textReportCard, Some(textReportCardSql)),
    "text_bm25" -> QueryDef(textBm25, Some(textBm25Sql)),
    "text_classifier_score" -> QueryDef(textClassifierScore, Some(textClassifierScoreSql)),
    "text_domain_cap" -> QueryDef(textDomainCap, Some(textDomainCapSql)),
    "text_boilerplate" -> QueryDef(textBoilerplate, Some(textBoilerplateSql)),
    "text_substring_dedup" -> QueryDef(textSubstringDedup, Some(textSubstringDedupSql)),
    "text_dsir_select" -> QueryDef(textDsirSelect, Some(textDsirSelectSql)),
    "text_bpe_first_merge" -> QueryDef(textBpeFirstMerge, Some(textBpeFirstMergeSql)),
    "text_bpe_merges" -> QueryDef(textBpeMerges, Some(textBpeMergesSql)),
    "text_bpe_encode" -> QueryDef(textBpeEncode, Some(textBpeEncodeSql)),
    "dedup_exact" -> QueryDef(dedupExact, Some(dedupExactSql)),
    "dedup_exact_hash" -> QueryDef(dedupExactHash, Some(dedupExactHashSql)),
    "dedup_minhash_pairs" -> QueryDef(dedupMinhash, None),
    "dedup_minhash_planted" -> QueryDef(dedupMinhashPlanted, Some(dedupPlantedSql)),
    "dedup_index_planted" -> QueryDef(dedupIndexPlanted, Some(dedupPlantedSql)),
    "dedup_simhash_pairs" -> QueryDef(dedupSimhash, None),
    "dedup_simhash_planted" -> QueryDef(dedupSimhashPlanted, Some(dedupPlantedSql)),
    "dedup_ngram_jaccard" -> QueryDef(dedupNgramJaccard, Some(dedupNgramJaccardSql)),
    "dedup_canonical" -> QueryDef(dedupCanonical, Some(dedupCanonicalSql)),
    "dedup_cluster_planted" -> QueryDef(dedupClusterPlanted, Some(dedupClusterPlantedSql)),
    "sample_stratified" -> QueryDef(sampleStratified, Some(sampleStratifiedSql)),
    "sample_mixture" -> QueryDef(sampleMixture, Some(sampleMixtureSql)),
    "export_jsonl_roundtrip" -> QueryDef(exportJsonlRoundtrip, Some(exportJsonlSql)),
    "wh_zonemap_prune" -> QueryDef(whZonemapPrune, Some(whZonemapPruneSql)),
    "wh_merge_delete" -> QueryDef(whMergeDelete, Some(whMergeDeleteSql)),
    "wh_delete_mor" -> QueryDef(whDeleteMor, Some(whDeleteMorSql)),
    "wh_update_where" -> QueryDef(whUpdateWhere, Some(whUpdateWhereSql)),
    "wh_schema_evolve" -> QueryDef(whSchemaEvolve, Some(whSchemaEvolveSql)),
    "wh_expect_drop" -> QueryDef(whExpectDrop, Some(whExpectDropSql)),
    "graft_source_scan" -> QueryDef(graftSourceScan, Some(graftSourceScanSql)),
    "graft_changefeed" -> QueryDef(graftChangefeed, Some(graftChangefeedSql)),
    "graft_cdf_merge" -> QueryDef(graftCdfMerge, Some(graftCdfMergeSql)),
    "graft_sql_changes" -> QueryDef(graftSqlChanges, Some(graftSqlChangesSql)),
    "graft_sql_maintain" -> QueryDef(graftSqlMaintain, Some(graftSqlMaintainSql)),
    "graft_file_skip" -> QueryDef(graftFileSkip, Some(graftFileSkipSql)),
    "graft_analyze" -> QueryDef(graftAnalyze, Some(graftFileSkipSql)),
    "graft_agg_push" -> QueryDef(graftAggPush, Some(graftAggPushSql)),
    "graft_limit_push" -> QueryDef(graftLimitPush, Some(graftLimitPushSql)),
    "graft_bucket_join" -> QueryDef(graftBucketJoin, Some(graftBucketJoinSql)),
    "graft_time_part" -> QueryDef(graftTimePart, Some(graftTimePartSql)),
    "graft_write_order" -> QueryDef(graftWriteOrder, Some(graftWriteOrderSql)),
    "graft_two_level" -> QueryDef(graftTwoLevel, Some(graftTwoLevelSql)),
    "graft_sorted_join" -> QueryDef(LayoutQueries.graftSortedJoin, Some(LayoutQueries.graftSortedJoinSql)),
    "wh_rename_evolve" -> QueryDef(LayoutQueries.graftRenameEvolve, Some(LayoutQueries.graftRenameEvolveSql)),
    "graft_tag_travel" -> QueryDef(LayoutQueries.graftTagTravel, Some(LayoutQueries.graftTagTravelSql)),
    "graft_runtime_skip" -> QueryDef(LayoutQueries.graftRuntimeSkip, Some(LayoutQueries.graftRuntimeSkipSql)),
    "graft_bloom_point" -> QueryDef(LayoutQueries.graftBloomPoint, Some(LayoutQueries.graftBloomPointSql)),
    "graft_incr_mv" -> QueryDef(MvQueries.graftIncrMv, Some(MvQueries.graftIncrMvSql)),
    "graft_mv_approx" -> QueryDef(MvQueries.graftMvApprox, Some(MvQueries.graftMvApproxSql)),
    "graft_sql_mv" -> QueryDef(MvQueries.graftSqlMv, Some(MvQueries.graftSqlMvSql)),
    "graft_stream_cdf" -> QueryDef(graftStreamCdf, Some(graftStreamCdfSql)),
    "graft_write_roundtrip" -> QueryDef(graftWriteRoundtrip, Some(graftWriteRoundtripSql)),
    "graft_stream_sink" -> QueryDef(graftStreamSink, Some(graftStreamSinkSql)),
    "wh_cdc_apply" -> QueryDef(whCdcApply, Some(whCdcApplySql)),
    "wh_time_travel" -> QueryDef(whTimeTravel, Some(whTimeTravelSql)),
    "wh_sql_catalog" -> QueryDef(whSqlCatalog, Some(whSqlCatalogSql)),
    "wh_sql_merge" -> QueryDef(whSqlMerge, Some(whSqlMergeSql)),
    "wh_sql_merge_bounded" -> QueryDef(whSqlMergeBounded, Some(whSqlMergeBoundedSql)),
    "text_train_grad0" -> QueryDef(textTrainGrad0, Some(textTrainGrad0Sql)),
    "export_tokenbin_roundtrip" -> QueryDef(exportTokenBin, Some(exportTokenBinSql)),
    "warc_roundtrip" -> QueryDef(warcRoundtrip, Some(warcRoundtripSql)),
    "export_tfrecord_roundtrip" -> QueryDef(tfrecordRoundtrip, Some(tfrecordRoundtripSql)),
    "sample_mixture_epochs" -> QueryDef(sampleMixtureEpochs, Some(sampleMixtureEpochsSql)),
    "mm_image_dedup" -> QueryDef(mmImageDedup, Some(mmImageDedupSql)),
    "mm_audio_dedup" -> QueryDef(mmAudioDedup, Some(mmAudioDedupSql)),
    "mm_video_dedup" -> QueryDef(mmVideoDedup, Some(mmVideoDedupSql)),
    "shard_plan" -> QueryDef(shardPlan, Some(shardPlanSql)),
    "pack_sequences" -> QueryDef(packSequences, Some(packSequencesSql)),
    "sample_token_budget" -> QueryDef(sampleTokenBudget, Some(sampleTokenBudgetSql)),
    "sim_topk_bruteforce" -> QueryDef(simTopk, Some(simTopkSql)),
    "sim_ivf_topk" -> QueryDef(simIvf, Some(simIvfSql)),
    "sim_ivf_recall" -> QueryDef(simIvfRecall, Some(simRecallSql)),
    "sim_ivf_kmeans_recall" -> QueryDef(simIvfKMeansRecall, Some(simRecallSql)),
    "sim_index_recall" -> QueryDef(simIndexRecall, Some(simRecallSql)),
    "sim_rplsh_topk" -> QueryDef(simRpLsh, None),
    "sim_rplsh_recall" -> QueryDef(simRpLshRecall, Some(simRecallSql)),
    "sim_quantized_recall" -> QueryDef(simQuantizedRecall, Some(simRecallSql)),
    "sim_pq_recall" -> QueryDef(simPqRecall, Some(simRecallSql)),
    "sim_semdedup_planted" -> QueryDef(simSemdedupPlanted, Some(simSemdedupPlantedSql)),
    "sim_decontam_embed" -> QueryDef(simDecontamEmbed, Some(simDecontamEmbedSql)),
    "emb_quantize_int8" -> QueryDef(embQuantize, Some(embQuantizeSql)),
    "emb_l2_normalize" -> QueryDef(embL2Normalize, Some(embL2NormalizeSql)),
    "emb_random_projection" -> QueryDef(embRandomProjection, Some(embRandomProjectionSql)),
    "sim_neardup_cosine" -> QueryDef(simNearDup, Some(simNearDupSql)),
    "sim_neardup_lsh" -> QueryDef(simNearDupLsh, Some(simNearDupLshSql)),
    "mm_resize" -> QueryDef(mmResize, Some(mmResizeSql)),
    "mm_frames" -> QueryDef(mmFrames, Some(mmFramesSql)),
    "mm_image_features" -> QueryDef(mmImageFeatures, Some(mmImageFeaturesSql)),
    "mm_av_features" -> QueryDef(mmAvFeatures, Some(mmAvFeaturesSql)),
    "mm_video_keyframes" -> QueryDef(mmVideoKeyframes, Some(mmVideoKeyframesSql)),
    "skewjoin_salted" -> QueryDef(skewJoinSalted, Some(skewJoinSaltedSql)),
    "ev_tumbling" -> QueryDef(evTumbling, Some(evTumblingSql)),
    "ev_tumbling_stream" -> QueryDef(evTumblingStream, Some(evTumblingSql)),
    "ev_sliding" -> QueryDef(evSliding, Some(evSlidingSql)),
    "ev_session" -> QueryDef(evSession, Some(evSessionSql)),
    "ev_session_stream" -> QueryDef(evSessionStream, Some(evSessionSql)),
    "ev_running_stream" -> QueryDef(evRunningStream, Some(evRunningStreamSql)),
    "ev_dedup_stream" -> QueryDef(evDedupStream, Some(evDedupStreamSql)),
    "ev_join_stream" -> QueryDef(evJoinStream, Some(evJoinStreamSql)),
    "ev_asof_stream" -> QueryDef(evAsofStream, Some(evAsofStreamSql)),
    "ev_asof_stream_wm" -> QueryDef(evAsofStreamWm, Some(evAsofStreamSql)),
    "ev_json_kpi" -> QueryDef(evJsonKpi, Some(evJsonKpiSql)),
    "ev_variant_kpi" -> QueryDef(
      (s, dir) => EventWindows.variantKpi(Tables.events(s, dir)),
      Some(evJsonKpiSql)))
}
