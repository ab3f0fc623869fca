package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The five-stage pipeline as a composition — the Spark analogue of the
  * reference's `etl.extract` orchestration (match → validate → extract →
  * transform → load, src/main/etl.js:729-756 with the phase fall-through
  * at :538-542): one registered `PipelineMapping` bundles the per-phase
  * specs (reference `register`, src/main/etl.js:139-141), and `run`
  * chains them over a whole DataFrame batch.
  *
  * Semantics preserved: match dispatch is the ONLY row-discarding phase;
  * validation annotates (`_valid` + observe metric); extract compiles to
  * set-oriented lookup joins, never per-row RPC.
  */
object Pipeline {

  final case class PipelineMapping(
      name: String,
      matchSpec: Seq[(String, Any)],                      // F4 metadata equality
      defaults: Seq[(String, Any)] = Nil,                 // T7 patch
      validation: Validate.Spec = Nil,                    // F1-F3
      extract: Seq[(String, Extract.Extractor)] = Nil,    // J6/U2
      transform: Option[Transform.TObj] = None)           // T2 reshape

  /** Dispatch the batch across `mappings`, keep the rows routed to
    * `target`, then run that mapping's phases in reference order.
    */
  def run(df: DataFrame, mappings: Seq[PipelineMapping], target: String): DataFrame = {
    val m = mappings.find(_.name == target).getOrElse(
      throw new IllegalArgumentException(s"unregistered mapping: $target"))
    val routed = Validate.dispatch(df,
      mappings.map(mm => Validate.Mapping(mm.name, mm.matchSpec)))
    var cur = routed.filter(col("_mapping") === m.name).drop("_mapping")
    if (m.defaults.nonEmpty) cur = Transform.applyDefaults(cur, m.defaults)
    if (m.validation.nonEmpty)
      cur = Validate.observed(Validate.validate(cur, m.validation), s"pipeline_${m.name}")
    if (m.extract.nonEmpty) cur = Extract.extract(cur, m.extract)
    m.transform.fold(cur)(sp => Transform.applyTransform(cur, sp))
  }
}
