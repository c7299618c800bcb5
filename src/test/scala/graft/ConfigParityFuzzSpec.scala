package graft.archive

import java.nio.file.Files

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property-fuzzed parity for the config-governed surface — the same
  * drift insurance DirectParityFuzzSpec gives the serving folds,
  * applied to the OTHER dual-implementation risk: the command layer
  * (ConfigCommands) vs an independent in-test model, the XML
  * import/export round trip, and the direct-vs-engine serve under
  * every config state a random command sequence can reach (renames,
  * disable flips, retention/level edits, two-phase removals, pending
  * recovery, hostile channel names).
  *
  * ≥100 generated command sequences per run; a subset carries real
  * committed data and asserts byte-parity serves (both refuseDisabled
  * modes) after every mutation step, so a command landing between two
  * serves can never leave the fast path answering stale config.
  */
class ConfigParityFuzzSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = TestSpark.session

  private val NS = graft.core.Samples.NS
  private val T0 = 1704067200L * NS
  private val Widened = Some(ArchiveReader.AtOrWidened)

  // ---- the independent model -----------------------------------------

  /** The spec's own normalization — deliberately re-derived from the
    * documented contract (negative retention → 0, raw level always
    * present), NOT a call into the engine's normalize.
    */
  private def modelNormalize(c: ChannelConfig): ChannelConfig = {
    val lv = c.levels.map { case (p, r) => p -> math.max(0L, r) }
    c.copy(levels = if (lv.contains(0L)) lv else lv + (0L -> 0L))
  }

  // ---- command generation ---------------------------------------------

  private sealed trait Cmd
  private case class Add(name: String, dataId: String, enabled: Boolean,
                         levels: Map[Long, Long],
                         options: Map[String, String]) extends Cmd
  private case class Update(name: String, enabled: Boolean,
                            levels: Map[Long, Long],
                            wrongDataId: Boolean) extends Cmd
  private case class Rename(from: String, to: String) extends Cmd
  private case class Remove(name: String) extends Cmd
  /** beginRemove then "crash"; recoverPending must roll it forward. */
  private case class CrashedRemove(name: String) extends Cmd
  private case object XmlRoundTrip extends Cmd

  /** Hostile name pool: XML metacharacters, JS-breakout punctuation
    * (the r11 admin-UI XSS shape), non-ASCII incl. supplementary
    * plane, spaces, quotes.
    */
  private def namePool(seq: Int): Vector[String] = Vector(
    s"pv:q$seq:a", s"pv:q$seq:b", s"pv:q$seq:c",
    s"pv:q$seq:d", s"pv:q$seq:<&>\"'", s"pv:q$seq:x');fetch('",
    s"pv:q$seq:α β", s"pv:q$seq:😀")

  private def levelsGen: Gen[Map[Long, Long]] = for {
    periods <- Gen.someOf(Seq(0L, 30L, 3600L, 86400L))
    rets <- Gen.listOfN(periods.size,
      Gen.oneOf(-5L, 0L, 3600L, 86400L * 30))
  } yield periods.zip(rets).toMap

  private def cmdGen(pool: Vector[String]): Gen[Cmd] = {
    val name = Gen.oneOf(pool)
    Gen.frequency(
      5 -> (for {
        n <- name; id <- Gen.oneOf(pool.indices)
        en <- Gen.oneOf(true, false); lv <- levelsGen
        opts <- Gen.mapOf(Gen.zip(Gen.oneOf("unit", "rate", "x<y&z"),
          Gen.alphaNumStr.map(_.take(6))))
      } yield Add(n, s"fid-$id", en, lv, opts)),
      5 -> (for {
        n <- name; en <- Gen.oneOf(true, false); lv <- levelsGen
        wrong <- Gen.frequency(9 -> Gen.const(false), 1 -> Gen.const(true))
      } yield Update(n, en, lv, wrong)),
      4 -> (for { a <- name; b <- name } yield Rename(a, b)),
      2 -> name.map(Remove(_)),
      1 -> name.map(CrashedRemove(_)),
      2 -> Gen.const(XmlRoundTrip))
  }

  private def gen[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // ---- applying a command to engine + model, with error parity --------

  /** Apply `cmd` to the config log AND the model; the engine must
    * succeed exactly when the model says the command is legal, and the
    * surviving state must match the model after every step.
    */
  private def applyBoth(cfgDir: String, store: Option[String], cmd: Cmd,
                        model: scala.collection.mutable.Map[String, ChannelConfig],
                        tag: String): Unit = cmd match {
    case Add(n, id, en, lv, opts) =>
      val cfg = ChannelConfig(n, id, "ca", en, opts, lv)
      val res = Try(ConfigCommands.addChannel(spark, cfgDir, cfg))
      if (model.contains(n)) {
        assert(res.isFailure &&
          res.failed.get.isInstanceOf[ChannelAlreadyExistsException],
          s"$tag add existing '$n': $res")
      } else {
        assert(res.isSuccess, s"$tag add '$n': $res")
        model(n) = modelNormalize(cfg)
      }
    case Update(n, en, lv, wrongId) =>
      val base = model.get(n)
      val id = base.map(_.channelDataId).getOrElse("fid-none")
      val cfg = ChannelConfig(n, if (wrongId) id + "-x" else id, "ca",
        en, base.map(_.options).getOrElse(Map.empty), lv)
      val res = Try(ConfigCommands.updateChannel(spark, cfgDir, cfg))
      base match {
        case None =>
          assert(res.isFailure &&
            res.failed.get.isInstanceOf[NoSuchChannelException],
            s"$tag update missing '$n': $res")
        case Some(_) if wrongId =>
          // data id is immutable — the engine must refuse
          assert(res.isFailure, s"$tag update wrong-id '$n': $res")
        case Some(_) =>
          assert(res.isSuccess, s"$tag update '$n': $res")
          model(n) = modelNormalize(cfg)
      }
    case Rename(a, b) =>
      val res = Try(ConfigCommands.renameChannel(spark, cfgDir, a, b))
      (model.get(a), model.contains(b)) match {
        case (None, _) =>
          assert(res.isFailure &&
            res.failed.get.isInstanceOf[NoSuchChannelException],
            s"$tag rename missing '$a': $res")
        case (Some(_), true) =>
          // self-rename is target-taken too: a → a must refuse
          assert(res.isFailure &&
            res.failed.get.isInstanceOf[ChannelAlreadyExistsException],
            s"$tag rename to taken '$b': $res")
        case (Some(c), false) =>
          assert(res.isSuccess, s"$tag rename '$a'→'$b': $res")
          model.remove(a); model(b) = c.copy(name = b)
      }
    case Remove(n) =>
      val res = Try(ConfigCommands.removeChannel(spark, cfgDir, n, store))
      if (model.contains(n)) {
        assert(res.isSuccess, s"$tag remove '$n': $res")
        model.remove(n)
      } else assert(res.isFailure &&
        res.failed.get.isInstanceOf[NoSuchChannelException],
        s"$tag remove missing '$n': $res")
    case CrashedRemove(n) =>
      if (model.contains(n)) {
        ConfigCommands.beginRemove(spark, cfgDir, n)
        // the pending marker must LOCK the channel for every command
        intercept[PendingChannelOperationException] {
          ConfigCommands.updateChannel(spark, cfgDir,
            model(n).copy(enabled = !model(n).enabled))
        }
        // crash here; recovery rolls the removal forward
        val recovered = ConfigCommands.recoverPending(spark, cfgDir, store)
        assert(recovered.contains(n), s"$tag recover '$n': $recovered")
        model.remove(n)
      }
    case XmlRoundTrip =>
      val st = ConfigCommands.state(spark, cfgDir)
      val xml = ChannelConfigXml.exportXml("fuzz", st.configs)
      val (sid, back) = ChannelConfigXml.importXml(xml)
      assert(sid == "fuzz")
      assert(back.sortBy(_.name) == st.configs.sortBy(_.name),
        s"$tag xml round trip diverged")
  }

  private def assertStateMatchesModel(cfgDir: String,
      model: scala.collection.mutable.Map[String, ChannelConfig],
      tag: String): Unit = {
    val st = ConfigCommands.state(spark, cfgDir)
    assert(st.pending.isEmpty, s"$tag leftover pending ops: ${st.pending}")
    val engine = st.configs.map(c => c.name -> c).toMap
    assert(engine == model.toMap,
      s"$tag config state diverged from model\nengine=$engine\nmodel=$model")
  }

  // ---- serve parity under a mutated config ----------------------------

  private def compareServe(cfgDir: String, store: String, name: String,
                           lo: Long, hi: Long, refuseDisabled: Boolean,
                           tag: String): Unit = {
    val fast = Try(DirectServe.tryServe(spark, cfgDir, store, name, lo, hi,
      None, ManifestBackend, Widened, Widened, refuseDisabled)
      .map(_.toVector))
    val slow = Try(ConfiguredArchive.serveJsonSpark(spark, cfgDir, store,
      name, lo, hi, None, ManifestBackend, Widened, Widened,
      refuseDisabled).toVector)
    (fast, slow) match {
      case (Success(Some(f)), Success(s)) =>
        assert(f == s, s"$tag '$name': direct/engine bytes diverged")
      case (Success(None), Success(_)) => () // declined: engine answers
      case (Failure(a), Failure(b)) =>
        assert(a.getClass == b.getClass,
          s"$tag '$name': error classes diverged: $a vs $b")
      case (a, b) =>
        fail(s"$tag '$name': one path failed, the other answered: $a vs $b")
    }
  }

  // ---- the fuzz tests --------------------------------------------------

  test("≥100 random command sequences: engine state tracks the model, " +
      "errors class-exact, XML round-trips") {
    var sequences = 0
    var commands = 0
    for (seq <- 0 until 100) {
      val cfgDir = Files.createTempDirectory("cfgfz").toString
      val pool = namePool(seq)
      val model = scala.collection.mutable.Map.empty[String, ChannelConfig]
      val n = gen(Gen.choose(4, 10), 40000L + seq)
      (0 until n).foreach { step =>
        val cmd = gen(cmdGen(pool), 41000L * seq + step)
        applyBoth(cfgDir, None, cmd, model, s"seq$seq/step$step")
        commands += 1
      }
      assertStateMatchesModel(cfgDir, model, s"seq$seq")
      // final XML round trip over whatever names/options survived
      applyBoth(cfgDir, None, XmlRoundTrip, model, s"seq$seq/final")
      sequences += 1
    }
    info(s"$sequences sequences, $commands commands")
    assert(sequences == 100)
  }

  test("serve parity holds through every mutation of a data-carrying store") {
    import spark.implicits._
    for (seq <- 0 until 12) {
      val cfgDir = Files.createTempDirectory("cfgfzd").toString
      val store = Files.createTempDirectory("cfgfzs").toString
      val pool = namePool(1000 + seq)
      val model = scala.collection.mutable.Map.empty[String, ChannelConfig]
      // three initial channels with committed rows
      val initial = pool.take(3)
      initial.zipWithIndex.foreach { case (nm, i) =>
        val cfg = ChannelConfig(nm, s"fid-$i", "ca", enabled = true,
          Map.empty, Map(3600L -> 0L))
        ConfigCommands.addChannel(spark, cfgDir, cfg)
        model(nm) = modelNormalize(cfg)
      }
      val rows = initial.zipWithIndex.flatMap { case (nm, i) =>
        (0 until 25).map(k =>
          (nm, T0 + (i * 7 + k * 60L) * NS, k.toDouble, "", 0, 0,
            (i * 100 + k).toLong))
      }
      ConfiguredArchive.materialize(spark, cfgDir, store,
        rows.toDF("channel", "ts", "value", "str_value", "severity",
          "status", "sample_id"))
      val lo = T0
      val hi = T0 + 3600L * NS
      val nCmd = gen(Gen.choose(3, 7), 50000L + seq)
      (0 until nCmd).foreach { step =>
        val cmd = gen(cmdGen(pool), 51000L * seq + step)
        applyBoth(cfgDir, Some(store), cmd, model, s"dseq$seq/step$step")
        // after EVERY mutation: one live-or-missing name, both
        // refuseDisabled modes — the fast path may not serve stale
        // config (rename/disable landing between two serves)
        val probe = gen(Gen.oneOf(pool), 52000L * seq + step)
        compareServe(cfgDir, store, probe, lo, hi,
          refuseDisabled = false, s"dseq$seq/step$step/serve")
        compareServe(cfgDir, store, probe, lo, hi,
          refuseDisabled = true, s"dseq$seq/step$step/refuse")
      }
      // full final sweep over every name ever in the pool
      pool.foreach { nm =>
        compareServe(cfgDir, store, nm, lo, hi,
          refuseDisabled = false, s"dseq$seq/final")
      }
      assertStateMatchesModel(cfgDir, model, s"dseq$seq")
    }
  }
}
