package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §2 for the full inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    core.CoreQueries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    core.CoreQueries.queries ++ core.ExtraQueries.queries ++ core.WindowQueries.queries ++
      core.BehaviorQueries.queries ++
      core.MiscQueries.queries ++ mart.MartQueries.queries ++ mart.IncrementalMart.queries ++
      etl.EtlQueries.queries ++ etl.DataQuality.queries ++ ops.LlmQueries.queries ++ ops.ScaleDedup.queries ++
      ops.AnnLsh.queries ++ ops.Multimodal.queries ++ ops.AsofJoin.queries ++ ops.VectorAgg.queries ++
      ops.Curation.queries ++ ops.RangeJoin.queries ++ ops.CorpusOps.queries ++
      ops.BpeTrain.queries ++ ops.EmbeddingPca.queries ++ ops.SemanticDedup.queries ++
      ops.EmbeddingSq.queries ++ ops.QualityTrain.queries ++ ops.ZorderLayout.queries ++
      ops.BloomDedup.queries ++ ops.KnnGraph.queries ++ ops.Bm25.queries ++
      etl.CdcApply.queries ++ core.EngagementQueries.queries ++ ops.DedupCascade.queries ++
      core.TpchMore.queries ++ ops.MmrSearch.queries ++ etl.Reconcile.queries ++
      core.StatsQueries.queries ++ ops.AnnEval.queries ++ ops.Collocations.queries ++
      mart.TrendingQueries.queries ++ mart.DiscoveryQueries.queries ++
      etl.UserPurge.queries ++ ops.Recommend.queries ++ core.HoltForecast.queries ++
      ops.CfIndex.queries ++ ops.DedupEval.queries ++ ops.Rake.queries ++
      ops.CurationPipeline.queries ++ streaming.ForecastServe.queries ++
      streaming.StreamServe.queries ++ core.AttributionQueries.queries ++
      ops.PhraseSearch.queries ++ ops.ChurnTrain.queries ++ ops.Als.queries ++
      core.TrendQueries.queries ++ core.HwForecast.queries ++
      mart.SkylineQueries.queries ++ ops.AgreementEval.queries ++
      core.RankTests.queries ++ core.SeasonalityQueries.queries ++
      ops.RecEval.queries ++ core.GrowthQueries.queries ++
      etl.OrcRoundtrip.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    core.CoreQueries.oracleSql ++ core.ExtraQueries.oracleSql ++ core.WindowQueries.oracleSql ++
      core.BehaviorQueries.oracleSql ++
      core.MiscQueries.oracleSql ++ mart.MartQueries.oracleSql ++ mart.IncrementalMart.oracleSql ++
      etl.EtlQueries.oracleSql ++ etl.DataQuality.oracleSql ++ ops.LlmQueries.oracleSql ++ ops.ScaleDedup.oracleSql ++
      ops.AsofJoin.oracleSql ++
      ops.VectorAgg.oracleSql ++ ops.Curation.oracleSql ++ ops.RangeJoin.oracleSql ++
      ops.CorpusOps.oracleSql ++ ops.EmbeddingPca.oracleSql ++ ops.Multimodal.oracleSql ++
      ops.EmbeddingSq.oracleSql ++ ops.ZorderLayout.oracleSql ++ ops.BloomDedup.oracleSql ++
      ops.KnnGraph.oracleSql ++ ops.Bm25.oracleSql ++ etl.CdcApply.oracleSql ++
      core.EngagementQueries.oracleSql ++ core.TpchMore.oracleSql ++ ops.MmrSearch.oracleSql ++
      etl.Reconcile.oracleSql ++ core.StatsQueries.oracleSql ++
      ops.Collocations.oracleSql ++ mart.TrendingQueries.oracleSql ++
      mart.DiscoveryQueries.oracleSql ++ etl.UserPurge.oracleSql ++
      ops.Recommend.oracleSql ++ core.HoltForecast.oracleSql ++
      ops.CfIndex.oracleSql ++ ops.Rake.oracleSql ++
      streaming.ForecastServe.oracleSql ++ streaming.StreamServe.oracleSql ++
      core.AttributionQueries.oracleSql ++ ops.PhraseSearch.oracleSql ++
      ops.BpeTrain.oracleSql ++ ops.Als.oracleSql ++ ops.AnnLsh.oracleSql ++
      ops.AnnEval.oracleSql ++ core.TrendQueries.oracleSql ++
      core.HwForecast.oracleSql ++ mart.SkylineQueries.oracleSql ++
      ops.AgreementEval.oracleSql ++ core.RankTests.oracleSql ++
      core.SeasonalityQueries.oracleSql ++ ops.RecEval.oracleSql ++
      core.GrowthQueries.oracleSql ++ etl.OrcRoundtrip.oracleSql
}
