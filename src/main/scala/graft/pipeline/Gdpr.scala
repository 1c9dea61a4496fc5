package graft.pipeline

import graft.ops.ScdHash
import graft.tx.{AtomicRewrite, Upsert}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** GDPR right-to-be-forgotten propagation (reference:
  * gdpr/gdpr_propagate_erasure.py).
  *
  * For each processed erasure subject, every configured table gets an
  * update-only merge rewriting the PII columns (M5), and an irreversible
  * salted-fingerprint audit row records what was scrubbed — never the raw
  * subject id. Anonymization runs over ALL versions (SCD2 history included),
  * matching the reference's backfill ordering guarantee that history rows
  * are redacted too.
  *
  * Scale: subject sets are tiny relative to the table → forced broadcast in
  * [[Upsert.updateOnly]]; each table rewrite is one narrow scan + map.
  */
object Gdpr {

  /** One table's redaction policy: which key matches the subject id and how
    * each PII column is rewritten (given the old column, usually ignored). */
  case class Policy(
      table: String,
      keyCol: String,
      setCols: Map[String, Column => Column],
      extraCond: Column = lit(true))

  val AuditCols: Seq[String] =
    Seq("subject_fingerprint", "subject_type", "table_name",
      "columns_scrubbed", "erased_at")

  /** Deterministic pseudonym: ANON-<16 hex of salted subject hash>. */
  def pseudonym(salt: String, subjectType: String, id: Column): Column =
    concat(lit("ANON-"),
      substring(ScdHash.subjectFingerprint(salt, lit(subjectType), id), 1, 16))

  /** Apply `policies` for the subject ids in `subjects` (single column =
    * the business id). Rewrites each table snapshot and appends one audit
    * row per (subject, table). Returns the audit DataFrame written. */
  def propagate(spark: SparkSession, subjects: DataFrame, subjectType: String,
                policies: Seq[Policy], tableRoot: String => String,
                auditRoot: String, salt: String, now: Timestamp): DataFrame = {
    val ids = subjects.toDF("subject_id").distinct().cache()
    // only policies whose table actually exists are applied — and only
    // those may claim audit rows (an audit entry for a never-rewritten
    // table would falsely record columns as scrubbed)
    val applied = policies.filter(p => AtomicRewrite.exists(spark, tableRoot(p.table)))
    // audit rows are claimed ONLY by policies whose table was actually
    // rewritten this run, and only for the SUBJECTS the table actually
    // held (the partitioned path skips the commit when no subject row
    // exists; a batch {A, B} against a table holding only A must audit
    // A alone — a row for B would falsely record B's columns as
    // scrubbed). The per-table matched id set is bounded by the
    // erasure batch.
    val rewritten: Seq[(Policy, Seq[Any])] = applied.flatMap { p =>
      val root = tableRoot(p.table)
      val t = AtomicRewrite.read(spark, root)
      val subjects = ids.select(col("subject_id").as(p.keyCol))
      AtomicRewrite.partitionColsOf(spark, root) match {
        // partition-committed table (hist dims, facts): erasure rewrites
        // ONLY the partitions holding a subject's rows — the erasure twin
        // of the incremental merges; every other partition of all-time
        // history rides the manifest untouched. Redaction never moves a
        // row (setCols must not touch partition columns), so the
        // affected set is exactly where the subjects live today.
        case Some(pcols) if pcols.nonEmpty && !pcols.exists(p.setCols.contains) =>
          // one pass collects the touched partitions (drives the pruned
          // rewrite) AND the matched subject ids (drives the audit)
          val pairs = t.join(broadcast(subjects), Seq(p.keyCol), "left_semi")
            .filter(p.extraCond)
            .select((p.keyCol +: pcols).map(col): _*).distinct().collect()
          if (pairs.nonEmpty) {
            val partRows = pairs.map(r => org.apache.spark.sql.Row.fromSeq(
              pcols.indices.map(i => r.get(i + 1)))).distinct.toSeq
            val parts = AtomicRewrite.literalFrame(spark, partRows,
              org.apache.spark.sql.types.StructType(pcols.map(c => t.schema(c))))
            // literal predicate → plan-time partition pruning; null-SAFE
            // via `<=>`: a NULL partition value is a legal dir
            // (__HIVE_DEFAULT_PARTITION__) whose bystander rows must be
            // in the slice while `replaced` names the dir
            val slice = t.filter(
              AtomicRewrite.partitionPredicate(pcols, partRows))
            AtomicRewrite.writePartitions(spark, root,
              Upsert.updateOnly(slice, subjects, Seq(p.keyCol), p.setCols,
                p.extraCond),
              pcols, replaced = Some(parts))
            Some(p -> pairs.map(_.get(0)).distinct.toSeq)
          } else None // no matching rows → nothing rewritten, no version burned
        case _ =>
          // probe first: a no-op updateOnly would still burn a version and
          // claim an audit row for a scrub that never touched a row —
          // mirror the partitioned path's subject-presence check
          val matched = t.join(broadcast(subjects), Seq(p.keyCol), "left_semi")
            .filter(p.extraCond)
            .select(col(p.keyCol)).distinct().collect().map(_.get(0)).toSeq
          if (matched.nonEmpty) {
            AtomicRewrite.write(spark, root,
              Upsert.updateOnly(t, subjects, Seq(p.keyCol), p.setCols, p.extraCond))
            Some(p -> matched)
          } else None
      }
    }
    if (rewritten.isEmpty) {
      // nothing rewritten → nothing to audit; writing spark.emptyDataFrame
      // (schemaless) to parquet would fail anyway
      ids.unpersist()
      return emptyAudit(ids, subjectType, now)
    }
    // the per-table matched sets are already ON THE DRIVER — the audit
    // rows materialize as folded literal-frame projections and the
    // one-file append commits driver-side (zero scheduled jobs), the
    // forgetStores discipline applied to the relational path
    val audit = rewritten.map { case (p, matched) =>
        auditRows(AtomicRewrite.literalFrame(spark,
            matched.distinct.map(org.apache.spark.sql.Row(_)), ids.schema),
          subjectType, p.table, p.setCols.keys.toSeq, salt, now)
      }
      .reduce(_ unionByName _)
    val rows = audit.collect().toSeq
    graft.tx.AppendLog.appendLocal(spark, auditRoot, rows, audit.schema)
    ids.unpersist()
    AtomicRewrite.literalFrame(spark, rows, audit.schema)
  }

  /** Zero-row audit frame with the canonical [[AuditCols]] schema. */
  private def emptyAudit(ids: DataFrame, subjectType: String,
                         now: Timestamp): DataFrame =
    ids.limit(0).select(
      lit("").as("subject_fingerprint"), lit(subjectType).as("subject_type"),
      lit("").as("table_name"),
      array().cast("array<string>").as("columns_scrubbed"),
      lit(now).as("erased_at"))

  /** One audit row per subject for one scrubbed table/store — the single
    * projection both [[propagate]] and [[forgetStores]] record, so the
    * [[AuditCols]] schema cannot drift between the two paths. */
  private def auditRows(ids: DataFrame, subjectType: String, table: String,
                        scrubbed: Seq[String], salt: String,
                        now: Timestamp): DataFrame =
    ids.select(
      ScdHash.subjectFingerprint(salt, lit(subjectType), col("subject_id"))
        .as("subject_fingerprint"),
      lit(subjectType).as("subject_type"),
      lit(table).as("table_name"),
      array(scrubbed.sorted.map(lit): _*).cast("array<string>")
        .as("columns_scrubbed"),
      lit(now).as("erased_at"))

  /** One derived corpus store's erasure hook: the audit name it is
    * recorded under, the artifact kinds being scrubbed (fingerprints,
    * signatures, embeddings — the audit's columns_scrubbed analog), and
    * the forget action, which receives the distinct subject ids as a
    * one-column `subject_id` frame, closes over the store root plus
    * whatever id/fingerprint derivation the store keys on, and returns
    * the SUBJECT ids the store actually held and erased (every store
    * `forget` returns its matched keys; closures whose store keys are
    * derived — content fingerprints — map them back through the same
    * derivation). The audit claims rows only for (subject, store) pairs
    * that were actually erased: a batch {A, B} against a store holding
    * only A must audit A alone, or B's artifacts would be falsely
    * recorded as scrubbed. */
  case class StoreErasure(store: String, artifacts: Seq[String],
                          forget: DataFrame => Seq[Any])

  /** Propagate right-to-be-forgotten across the DERIVED corpus stores —
    * the LLM-pipeline twin of [[propagate]]: where propagate scrubs PII
    * columns in the relational tables, this removes a subject's derived
    * artifacts from the dedup fingerprint store
    * ([[DedupStore.forget]]), the MinHash signature store
    * ([[NearDupStore.forget]]), the ANN index
    * ([[AnnIndexStore.forget]]), and any published training-shard epoch
    * ([[TrainingShards.forget]]) — each partition-aware, each leaving no
    * trace that would keep erased content matchable or retrievable.
    * Appends one audit row per erased (subject, store) pair, the same
    * irreversible salted-fingerprint record [[propagate]] writes
    * (reference: gdpr/gdpr_propagate_erasure.py's propagate-everywhere
    * contract extended to the similarity layer). Returns the audit rows
    * written.
    *
    * Failure containment: every store is ATTEMPTED, and each successful
    * store's audit rows are appended IMMEDIATELY after its rewrite —
    * before the next store runs — then the first failure rethrows
    * (others suppressed). The eager append is what makes a partial
    * failure recoverable: a store's delete commits irreversibly, and on
    * the retry cycle its forget matches nothing (the rows are already
    * gone) — so an audit row deferred past a later store's failure
    * would be lost FOREVER, leaving a real deletion with no compliance
    * record. */
  def forgetStores(spark: SparkSession, subjects: DataFrame,
                   subjectType: String, stores: Seq[StoreErasure],
                   auditRoot: String, salt: String,
                   now: Timestamp): DataFrame =
    forgetStoresStaged(spark, subjects, subjectType,
      stores.map(Seq(_)), auditRoot, salt, now)

  /** [[forgetStores]] with an explicit dependency structure: stages run
    * in sequence, the hooks WITHIN a stage concurrently (they must
    * touch disjoint stores with no cross-reads — the caller's proof,
    * e.g. [[CurationRunner.storeErasureStages]]). Hooks are driver-gap-
    * heavy chains of small discovery reads and partition commits, so a
    * stage of independent stores overlaps their planning and task tails
    * (the [[graft.pipeline.Runner.runBatch]] branch pattern). Each
    * successful hook's audit rows still append IMMEDIATELY after its
    * rewrite — appends serialize on one lock (the append log is a
    * single-writer layout) — so a sibling's failure can never lose a
    * committed deletion's compliance record. */
  def forgetStoresStaged(spark: SparkSession, subjects: DataFrame,
                         subjectType: String,
                         stages: Seq[Seq[StoreErasure]],
                         auditRoot: String, salt: String,
                         now: Timestamp): DataFrame = {
    val ids = subjects.toDF("subject_id").distinct().cache()
    if (ids.isEmpty || stages.forall(_.isEmpty)) {
      ids.unpersist()
      return emptyAudit(ids, subjectType, now)
    }
    val auditLock = new Object
    try {
      val failures =
        java.util.Collections.synchronizedList(
          new java.util.ArrayList[Throwable]())
      // the WHOLE per-store unit (forget + audit append) is one Try:
      // an audit-append failure must not abort the remaining stores any
      // more than a forget failure may. (Residual window: a delete that
      // commits and then fails its append before any retry loses that
      // one record — closing it needs a pre-commit intent log; the
      // erasure itself is never at risk.)
      def unit(s: StoreErasure): Option[DataFrame] =
        scala.util.Try {
          val matched = s.forget(ids)
          // audit rows are claimed ONLY for subjects the store actually
          // held and erased (propagate's contract: a row for an
          // untouched store — or an unheld subject — would falsely
          // record artifacts as scrubbed at `now`)
          if (matched.isEmpty) None
          else
            // the matched keys are already ON THE DRIVER, so the audit
            // rows materialize without a job (the salted-fingerprint
            // projection runs over a literal frame — still the engine's
            // own hash expressions, folded by the optimizer) and the
            // one-file append commits driver-side: the eager per-store
            // audit contract at zero scheduled jobs per store
            Some(auditLocalRows(spark, auditRoot, auditLock, ids.schema,
              matched, subjectType, s.store, s.artifacts, salt, now))
        } match {
          case scala.util.Success(opt) => opt
          case scala.util.Failure(e) => failures.add(e); None
        }
      val audits = stages.flatMap {
        case Seq(only) => unit(only) // no thread hop for a 1-hook stage
        case stage =>
          import scala.concurrent.{Await, Future}
          import scala.concurrent.duration.Duration
          implicit val ec: scala.concurrent.ExecutionContext = Runner.branchEc
          // every hook SETTLES before the stage ends (a failure above
          // must never unwind while a sibling is still committing)
          stage.map(s => Future(unit(s)))
            .map(f => Await.result(f, Duration.Inf)).flatten
      }
      import scala.jdk.CollectionConverters._
      failures.asScala.toList match {
        case first :: rest => rest.foreach(first.addSuppressed); throw first
        case Nil =>
      }
      if (audits.isEmpty) emptyAudit(ids, subjectType, now)
      else audits.reduce(_ unionByName _)
    } finally ids.unpersist()
  }

  /** [[auditRows]] + append for an already-COLLECTED matched-subject
    * set: the ids inline as a literal frame, the fingerprint projection
    * folds to local rows (zero jobs — still computed by the engine's
    * own hash expressions, never a driver reimplementation), and the
    * one-file append commits driver-side
    * ([[graft.tx.AppendLog.appendLocal]]). Returns the written rows as
    * a literal frame in the canonical [[AuditCols]] schema. */
  private def auditLocalRows(spark: SparkSession, auditRoot: String,
                             auditLock: Object,
                             idSchema: org.apache.spark.sql.types.StructType,
                             matched: Seq[Any], subjectType: String,
                             table: String, scrubbed: Seq[String],
                             salt: String, now: Timestamp): DataFrame = {
    val idsLocal = AtomicRewrite.literalFrame(spark,
      matched.distinct.map(org.apache.spark.sql.Row(_)), idSchema)
    val audit = auditRows(idsLocal, subjectType, table, scrubbed, salt, now)
    val rows = audit.collect().toSeq
    auditLock.synchronized(
      graft.tx.AppendLog.appendLocal(spark, auditRoot, rows, audit.schema))
    AtomicRewrite.literalFrame(spark, rows, audit.schema)
  }

  /** Whether any audit rows have ever been written. */
  def auditExists(spark: SparkSession, auditRoot: String): Boolean =
    graft.tx.AppendLog.exists(spark, auditRoot)

  /** Read the full audit log (legacy versioned layout still readable). */
  def readAudit(spark: SparkSession, auditRoot: String): DataFrame =
    graft.tx.AppendLog.read(spark, auditRoot)
}
