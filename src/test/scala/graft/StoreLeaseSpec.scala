package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SequencePacking
import graft.sources.StoreLease
import java.nio.file.{Files, Paths}

/** r15 verdict #2: the shard store's single-writer contract is a CHECKED
  * invariant now — a second concurrent writer fails loud, a crashed
  * holder's expired lease is stolen loudly, and a verb that outlives its
  * own lease refuses to report success.
  */
class StoreLeaseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshStore(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix).toString
    val df = (1L to 40L).map(i => (i, (i % 7) + 3, (1L to ((i % 7) + 3)).map(j => i * 100 + j)))
      .toDF("id", "tok", "ids")
    val packed = SequencePacking.packSequences(df, "id", "tok", "ids", budget = 30, partitions = 1)
    SequencePacking.exportShards(packed, dir, nShards = 2)
    dir
  }

  private def plantLock(dir: String, owner: String, expiresAt: Long, verb: String): Unit =
    Files.writeString(Paths.get(dir, StoreLease.LockFileName), s"$owner|$expiresAt|$verb")

  test("every mutating verb fails loud while another writer holds a live lease") {
    val dir = freshStore("graft_lease_live")
    plantLock(dir, "rival@otherhost#1", System.currentTimeMillis() + 60000L, "append")
    val extra = Seq((900L, 5L, (1L to 5L).map(_ + 90000L))).toDF("id", "tok", "ids")
    val packed = SequencePacking.packSequences(extra, "id", "tok", "ids", budget = 30, partitions = 1)

    val verbs: Seq[(String, () => Any)] = Seq(
      "appendShards" -> (() => SequencePacking.appendShards(packed, dir, "lease#x")),
      "retractFromShards" -> (() => SequencePacking.retractFromShards(spark, dir, Seq(1L))),
      "compactShards" -> (() => SequencePacking.compactShards(spark, dir)),
      "recertifyShards" -> (() => SequencePacking.recertifyShards(spark, dir)),
      "exportShards" -> (() => SequencePacking.exportShards(packed, dir, nShards = 2))
    )
    verbs.foreach { case (name, run) =>
      val ex = intercept[IllegalStateException](run())
      assert(ex.getMessage.contains("held by writer rival@otherhost#1"), s"$name: ${ex.getMessage}")
    }
    // readers never need the lease
    assert(SequencePacking.readShard(spark, dir, 0L).count() > 0L)
    assert(SequencePacking.verifyShards(spark, dir).where(!org.apache.spark.sql.functions.col("ok")).isEmpty)
    // and the rival's lease is untouched by the refused attempts
    assert(Files.readString(Paths.get(dir, StoreLease.LockFileName)).startsWith("rival@otherhost#1|"))
  }

  test("a crashed holder's EXPIRED lease is stolen loudly and the verb completes") {
    val dir = freshStore("graft_lease_dead")
    plantLock(dir, "dead@gonehost#2", System.currentTimeMillis() - 1000L, "compact")
    val before = spark.read.parquet(s"$dir/manifest").collect().map(_.toSeq).toSet
    // the verb steals the expired lease, runs, and releases its own
    SequencePacking.compactShards(spark, dir)
    assert(!Files.exists(Paths.get(dir, StoreLease.LockFileName)), "lease not released")
    spark.catalog.refreshByPath(s"$dir/manifest")
    assert(spark.read.parquet(s"$dir/manifest").collect().map(_.toSeq).toSet == before,
      "compaction under a stolen lease must stay content-identical")
  }

  test("a torn lock is LIVE while fresh (a writer may be mid-create) and dead once older than the ttl") {
    val dir = freshStore("graft_lease_torn")
    val lock = Paths.get(dir, StoreLease.LockFileName)
    Files.writeString(lock, "garbage-without-fields")
    // fresh mtime: never steal what can't be read unless it's too old to
    // still be being written — the verb fails loud and leaves the file
    val ex = intercept[IllegalStateException](SequencePacking.recertifyShards(spark, dir))
    assert(ex.getMessage.contains("unreadable but recently-written"), ex.getMessage)
    assert(Files.exists(lock), "a fresh torn lock must not be deleted")
    // backdate it past the ttl: now verifiably dead — stolen, verb completes
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - StoreLease.DefaultTtlMs - 1000L))
    SequencePacking.recertifyShards(spark, dir)
    assert(!Files.exists(lock))
  }

  test("a same-host DEAD pid's lease is stolen immediately — crash replay never waits out the ttl") {
    val dir = freshStore("graft_lease_deadpid")
    val host = java.net.InetAddress.getLocalHost.getHostName
    // pid far above linux's default pid_max: verifiably not running; the
    // lease itself is still LIVE by expiry — only the liveness check frees it
    plantLock(dir, s"4194305@$host#dead", System.currentTimeMillis() + 600000L, "append")
    SequencePacking.recertifyShards(spark, dir)
    assert(!Files.exists(Paths.get(dir, StoreLease.LockFileName)))
  }

  test("a verb that outlives its lease refuses to report success") {
    val dir = Files.createTempDirectory("graft_lease_lost").toString
    val ex = intercept[IllegalStateException] {
      StoreLease.withLease(dir, "spec-verb") {
        // simulate the TTL expiring mid-verb and a second writer stealing
        plantLock(dir, "thief@host#3", System.currentTimeMillis() + 60000L, "append")
        42
      }
    }
    assert(ex.getMessage.contains("lost mid-verb"))
    // ...but a verb that FAILED on its own keeps its own exception (the
    // lost lease is reported to stderr, not thrown over the real error)
    plantLock(dir, "thief@host#3", System.currentTimeMillis() - 1L, "append") // expired: next acquire steals
    val own = intercept[RuntimeException] {
      StoreLease.withLease(dir, "spec-verb") {
        plantLock(dir, "thief2@host#4", System.currentTimeMillis() + 60000L, "x")
        throw new RuntimeException("the verb's own failure")
      }
    }
    assert(own.getMessage == "the verb's own failure")

    // a verb whose lease EXPIRED while held (nobody stole it) still
    // refuses success — the protection lapsed — and leaves the lock in
    // place so a mid-steal racer's claim is never erased by our release
    java.nio.file.Files.deleteIfExists(Paths.get(dir, StoreLease.LockFileName))
    val lapsed = intercept[IllegalStateException] {
      StoreLease.withLease(dir, "slow-verb", ttlMs = 50L) { Thread.sleep(200L); 7 }
    }
    assert(lapsed.getMessage.contains("EXPIRED while held"), lapsed.getMessage)
    assert(Files.exists(Paths.get(dir, StoreLease.LockFileName)),
      "an expired own lock must be left for stealers")
  }

  test("nested same-store verbs do not deadlock: append's internal takedown heal runs under append's lease") {
    import org.apache.spark.sql.functions._
    // the double-fault shape (SequencePackingSpec's fabrication): a
    // tombstoned doc sits in a crashed append's unledgered tail; the
    // REPLAY — holding the store lease — must complete the crashed
    // takedown internally without tripping over its own lock
    val dir = freshStore("graft_lease_nested")
    val base = spark.read.parquet(s"$dir/meta").agg(max("next_after")).head().getLong(0)
    val crash = SequencePacking.packSequences(
      Seq((901L, 5L, (1L to 5L).map(_ + 90100L))).toDF("id", "tok", "ids"),
      "id", "tok", "ids", budget = 30, partitions = 1)
    Files.writeString(Paths.get(dir, "pending"), base.toString)
    crash
      .withColumn("bin_id", col("bin_id") + base)
      .withColumn("shard", pmod(col("bin_id"), lit(2L)))
      .write.mode("append").partitionBy("shard").parquet(s"$dir/data")
    Seq(901L).toDF("doc_id").coalesce(1).write.mode("append").parquet(s"$dir/tombstones")

    SequencePacking.appendShards(crash, dir, "lease#crash")
    assert(!Files.exists(Paths.get(dir, StoreLease.LockFileName)), "lease not released")
    val survivors = spark.read.parquet(s"$dir/data")
      .select(explode(col("doc_ids")).as("d")).where(col("d") === 901L)
    assert(survivors.isEmpty, "tombstoned doc survived the in-lease heal")
    assert(SequencePacking.verifyShards(spark, dir).where(!col("ok")).isEmpty)
  }
}
