package graft.operators

import org.apache.spark.sql.DataFrame

/** Batch counterpart of [[graft.streaming.Pipeline]]: the reference's
  * core abstraction is a pipeline that applies a pluggable `processor`
  * to a stream of messages (`pubsub_pipeline.py:62`); this is the same
  * idea over a bounded DataFrame — an ordered list of named stages, each
  * `DataFrame => DataFrame`, composed into ONE declarative plan.
  *
  * Composition is by construction zero-cost at any scale: stages build a
  * single logical plan that Catalyst optimizes END TO END — filters
  * written in a late stage push below shuffles introduced by an early
  * one (asserted for the quality gate in PlanGuardSpec's enrich test),
  * adjacent map stages fuse into one codegen span, and nothing
  * materializes between stages. The alternative (executing stage by
  * stage with checkpoints) is an operational choice the caller makes by
  * inserting an explicit barrier stage, not something the abstraction
  * imposes.
  *
  * `describe` gives the audit trail a 100 TB corpus run needs: which
  * passes, in which order, produced a shipped dataset.
  */
final case class BatchPipeline(stages: Seq[(String, DataFrame => DataFrame)]) {

  def andThen(name: String, stage: DataFrame => DataFrame): BatchPipeline =
    BatchPipeline(stages :+ (name -> stage))

  /** Fold the input through every stage — one composed logical plan. */
  def run(input: DataFrame): DataFrame =
    stages.foldLeft(input) { case (df, (_, stage)) => stage(df) }

  /** Stage names in application order. */
  def describe: Seq[String] = stages.map(_._1)
}

object BatchPipeline {
  def apply(stages: (String, DataFrame => DataFrame)*)(
      implicit d: DummyImplicit): BatchPipeline = BatchPipeline(stages.toSeq)
}
