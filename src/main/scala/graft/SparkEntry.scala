package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each SURVEY §2 key maps to a query here; SQL-expressible ones also
  * have a DuckDB oracle in [[oracleSql]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_join5")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.functions.TextOps.queries ++
      graft.operators.Dedup.queries ++
      graft.operators.Similarity.queries ++
      graft.operators.GridOps.queries ++
      graft.sources.netcdf.NcQueries.queries ++
      graft.sources.netcdf.Nc4Queries.queries ++
      graft.sources.netcdf.NcSel.queries ++
      graft.sources.netcdf.Nc4Sel.queries ++
      graft.streaming.Streams.queries ++
      graft.operators.MmPipeline.queries ++
      graft.operators.Salted.queries ++
      graft.operators.DedupClusters.queries ++
      graft.operators.PipelineKeepList.queries ++
      graft.operators.TemporalJoins.queries ++
      graft.operators.Contamination.queries ++
      graft.functions.Sketches.queries ++
      graft.functions.Bpe.queries ++
      graft.operators.CrossShard.queries ++
      graft.operators.BloomKeep.queries ++
      graft.operators.SamplePlan.queries ++
      graft.operators.Boilerplate.queries ++
      graft.operators.ScaleJoins.queries ++
      graft.operators.ShardManifest.queries ++
      graft.operators.Winnowing.queries ++
      graft.operators.DatasetCard.queries ++
      graft.operators.DatasetDiff.queries ++
      graft.operators.NgramLm.queries ++
      graft.operators.Dsir.queries ++
      graft.operators.NbClassifier.queries ++
      graft.operators.ZipfFit.queries ++
      graft.operators.CanonicalQuality.queries ++
      graft.operators.Decontaminate.queries ++
      graft.operators.CcnetBuckets.queries ++
      graft.operators.Fertility.queries ++
      graft.operators.LangidEval.queries ++
      graft.operators.CharEntropy.queries ++
      graft.operators.StreamBpe.queries ++
      graft.operators.Bm25.queries ++
      graft.operators.HybridSearch.queries ++
      graft.operators.Novelty.queries ++
      graft.operators.QualityEnsemble.queries ++
      graft.operators.Drift.queries ++
      graft.operators.EditDist.queries ++
      graft.operators.BloomFpr.queries ++
      graft.operators.Attrition.queries ++
      graft.operators.CorpusStats.queries ++
      graft.operators.Moments.queries ++
      graft.operators.Chunker.queries ++
      graft.operators.TfIdf.queries ++
      graft.operators.UniText.queries ++
      graft.operators.SourceQuota.queries ++
      graft.operators.NbCalibration.queries ++
      graft.operators.HeapsFit.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.functions.TextOps.oracles ++
      graft.operators.Dedup.oracles ++
      graft.operators.Similarity.oracles ++
      graft.operators.GridOps.oracles ++
      graft.sources.netcdf.NcQueries.oracles ++
      graft.sources.netcdf.Nc4Queries.oracles ++
      graft.sources.netcdf.NcSel.oracles ++
      graft.sources.netcdf.Nc4Sel.oracles ++
      graft.streaming.Streams.oracles ++
      graft.operators.MmPipeline.oracles ++
      graft.operators.Salted.oracles ++
      graft.operators.DedupClusters.oracles ++
      graft.operators.PipelineKeepList.oracles ++
      graft.operators.TemporalJoins.oracles ++
      graft.operators.Contamination.oracles ++
      graft.functions.Sketches.oracles ++
      graft.functions.Bpe.oracles ++
      graft.operators.CrossShard.oracles ++
      graft.operators.BloomKeep.oracles ++
      graft.operators.SamplePlan.oracles ++
      graft.operators.Boilerplate.oracles ++
      graft.operators.ScaleJoins.oracles ++
      graft.operators.ShardManifest.oracles ++
      graft.operators.Winnowing.oracles ++
      graft.operators.DatasetCard.oracles ++
      graft.operators.DatasetDiff.oracles ++
      graft.operators.NgramLm.oracles ++
      graft.operators.Dsir.oracles ++
      graft.operators.NbClassifier.oracles ++
      graft.operators.ZipfFit.oracles ++
      graft.operators.CanonicalQuality.oracles ++
      graft.operators.Decontaminate.oracles ++
      graft.operators.CcnetBuckets.oracles ++
      graft.operators.Fertility.oracles ++
      graft.operators.LangidEval.oracles ++
      graft.operators.CharEntropy.oracles ++
      graft.operators.StreamBpe.oracles ++
      graft.operators.Bm25.oracles ++
      graft.operators.HybridSearch.oracles ++
      graft.operators.Novelty.oracles ++
      graft.operators.QualityEnsemble.oracles ++
      graft.operators.Drift.oracles ++
      graft.operators.EditDist.oracles ++
      graft.operators.BloomFpr.oracles ++
      graft.operators.Attrition.oracles ++
      graft.operators.CorpusStats.oracles ++
      graft.operators.Moments.oracles ++
      graft.operators.Chunker.oracles ++
      graft.operators.TfIdf.oracles ++
      graft.operators.UniText.oracles ++
      graft.operators.SourceQuota.oracles ++
      graft.operators.NbCalibration.oracles ++
      graft.operators.HeapsFit.oracles
}
