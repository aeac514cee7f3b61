package graft.core

import org.apache.spark.sql.SparkSession

/** Execution-environment configs (reference X-1..X-3, X-5) and the
  * interactive SQL gate (X-4).
  *
  * The reference ships three launcher objects (local / embedded-cluster
  * / EC2, reference `CovType_Trainer_Local.scala:25`,
  * `CovType_Trainer_Embedded.scala:24-31`, `CovType_Trainer_EC2.scala:
  * 25-45`) whose substance is a handful of sizing numbers, plus Jackson
  * config serialization (`Trainer.scala:78-83`). Here the same facts
  * are one case class that renders to a SparkSession builder — the
  * local/cluster difference is only the master URL and sizing, exactly
  * as it should be for code that moves from local[32] to a 1000-executor
  * cluster unchanged.
  */
final case class RunnerConfig(
    master: String = "local[4]",
    appName: String = "graft",
    shufflePartitions: Int = 4,
    executorMemory: Option[String] = None,
    executorCores: Option[Int] = None,
    extraConf: Map[String, String] = Map.empty) {

  def builder(): SparkSession.Builder = {
    var b = GraftSession.builder(master, shufflePartitions, appName)
    executorMemory.foreach(m => b = b.config("spark.executor.memory", m))
    executorCores.foreach(c => b = b.config("spark.executor.cores", c.toString))
    extraConf.foreach { case (k, v) => b = b.config(k, v) }
    b
  }

  /** X-5: reproducible-run serialization. Plain key=value lines — no
    * JSON library dependency, trivially diffable in run logs.
    */
  def serialize: String = {
    val base = Seq(
      "master" -> master, "appName" -> appName,
      "shufflePartitions" -> shufflePartitions.toString) ++
      executorMemory.map("executorMemory" -> _) ++
      executorCores.map(c => "executorCores" -> c.toString) ++
      extraConf.toSeq.sortBy(_._1).map { case (k, v) => s"conf.$k" -> v }
    base.map { case (k, v) => s"$k=$v" }.mkString("\n")
  }
}

object RunnerConfig {

  /** X-1 analogue: local development sizing. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): RunnerConfig =
    RunnerConfig(master = s"local[$cores]", shufflePartitions = cores)

  /** X-2 analogue (reference: 2 workers × 2g, no Hive). */
  def embedded(workers: Int = 2, memoryPerWorker: String = "2g"): RunnerConfig =
    RunnerConfig(
      master = s"local-cluster[$workers,1,${parseMb(memoryPerWorker)}]",
      shufflePartitions = workers * 2,
      executorMemory = Some(memoryPerWorker))

  /** X-3 analogue (reference: M5_XL ≈ 4 vCPU/16g nodes, 14g workers).
    * Master URL is the caller's (YARN/k8s/standalone).
    */
  def cluster(masterUrl: String, executors: Int,
      executorMemory: String = "14g", executorCores: Int = 4): RunnerConfig =
    RunnerConfig(
      master = masterUrl,
      shufflePartitions = executors * executorCores * 2,
      executorMemory = Some(executorMemory),
      executorCores = Some(executorCores),
      extraConf = Map("spark.dynamicAllocation.enabled" -> "false"))

  def deserialize(s: String): RunnerConfig =
    s.linesIterator.filter(_.contains('=')).foldLeft(RunnerConfig()) {
      (cfg, line) =>
        val Array(k, v) = line.split("=", 2)
        k match {
          case "master" => cfg.copy(master = v)
          case "appName" => cfg.copy(appName = v)
          case "shufflePartitions" => cfg.copy(shufflePartitions = v.toInt)
          case "executorMemory" => cfg.copy(executorMemory = Some(v))
          case "executorCores" => cfg.copy(executorCores = Some(v.toInt))
          case ck if ck.startsWith("conf.") =>
            cfg.copy(extraConf = cfg.extraConf + (ck.drop(5) -> v))
          case _ => cfg
        }
    }

  private def parseMb(mem: String): Int = {
    val m = mem.trim.toLowerCase
    if (m.endsWith("g")) m.dropRight(1).toInt * 1024
    else if (m.endsWith("m")) m.dropRight(1).toInt
    else m.toInt
  }
}

/** X-4: the reference blocks its pipeline on an interactive SQL REPL
  * until the user has created the staging view (reference
  * `Trainer.scala:110-121`, catalog probe `207`). The engine-side
  * primitive is the gate itself: run script statements, await a view.
  */
object SqlGate {

  /** Execute semicolon-separated SQL statements in order; returns the
    * last statement's result.
    */
  def runScript(spark: SparkSession, script: String): Option[org.apache.spark.sql.DataFrame] =
    script.split(";").map(_.trim).filter(_.nonEmpty)
      .foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
        (_, stmt) => Some(spark.sql(stmt))
      }

  /** Poll the catalog until `viewName` exists (the reference's
    * `shouldContinue` loop) or the timeout elapses.
    */
  def awaitView(spark: SparkSession, viewName: String,
      timeoutMs: Long = 30000, pollMs: Long = 100): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (System.nanoTime() < deadline) {
      if (spark.catalog.tableExists(viewName)) return true
      Thread.sleep(pollMs)
    }
    spark.catalog.tableExists(viewName)
  }
}
