package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.archive.{ConfigCommands, HttpArchiveServer}

/** Property-fuzzed parity for the THIRD dual-implementation surface:
  * the HTTP command layer. `HttpAdminApi.applyCommand` re-implements
  * the reference's wire contract — partial updates where absent fields
  * keep their value, set-replacement vs add/remove DELTAS for levels
  * and options, the dual `decimationLevels` /
  * `decimationLevelToRetentionPeriod` encoding, server-generated data
  * ids on add, per-command success flags with a continuing batch —
  * independently of [[ConfigCommands]]. So fuzz it like the other two
  * tiers: random command batches over the live socket against a model
  * re-derived from the documented contract
  * (`UpdateChannelCommand.java:44-54`, ArchiveConfigurationCommand
  * wire names), with the engine state read back through the API after
  * every batch.
  */
class HttpCommandParityFuzzSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = TestSpark.session
  private val mapper = new ObjectMapper()

  // ---- the independent model ----------------------------------------

  /** What the spec believes a channel's config is — levels/options per
    * the documented merge rules, normalize per the documented contract
    * (negative retention → 0, raw level always present).
    */
  private case class Model(enabled: Boolean, levels: Map[Long, Long],
                           options: Map[String, String])

  private def norm(m: Model): Model = {
    val lv = m.levels.map { case (p, r) => p -> math.max(0L, r) }
    m.copy(levels = if (lv.contains(0L)) lv else lv + (0L -> 0L))
  }

  // ---- command generation -------------------------------------------

  private sealed trait Cmd { def json: ObjectNode }

  private def pool(seq: Int): Vector[String] = Vector(
    s"hv:$seq:a", s"hv:$seq:b", s"hv:$seq:c", s"hv:$seq:<&>\"'",
    s"hv:$seq:x');fetch('", s"hv:$seq:α😀")

  private case class Add(name: String, enabled: Option[Boolean],
                         levels: Map[Long, Long]) extends Cmd {
    def json: ObjectNode = {
      val o = mapper.createObjectNode()
      o.put("commandType", "add_channel")
      o.put("channelName", name)
      o.put("controlSystemType", "ca")
      enabled.foreach(o.put("enabled", _))
      if (levels.nonEmpty) {
        val lv = o.putObject("decimationLevelToRetentionPeriod")
        levels.foreach { case (p, r) => lv.put(p.toString, r) }
      }
      o
    }
  }

  private case class AddOrUpdate(name: String, enabled: Boolean,
                                 bareLevels: Seq[Long]) extends Cmd {
    def json: ObjectNode = {
      val o = mapper.createObjectNode()
      o.put("commandType", "add_or_update_channel")
      o.put("channelName", name)
      o.put("controlSystemType", "ca")
      o.put("enabled", enabled)
      // the reference's OTHER levels encoding: a bare set, retention 0
      val a = o.putArray("decimationLevels")
      bareLevels.foreach(a.add)
      o
    }
  }

  /** The partial update: every field independently present or absent. */
  private case class Update(name: String, enabled: Option[Boolean],
                            replaceLevels: Option[Map[Long, Long]],
                            addLevels: Seq[Long], removeLevels: Seq[Long],
                            addOptions: Map[String, String],
                            removeOptions: Seq[String]) extends Cmd {
    def json: ObjectNode = {
      val o = mapper.createObjectNode()
      o.put("commandType", "update_channel")
      o.put("channelName", name)
      enabled.foreach(o.put("enabled", _))
      replaceLevels.foreach { m =>
        val lv = o.putObject("decimationLevelToRetentionPeriod")
        m.foreach { case (p, r) => lv.put(p.toString, r) }
      }
      if (addLevels.nonEmpty) {
        val a = o.putArray("addDecimationLevels"); addLevels.foreach(a.add)
      }
      if (removeLevels.nonEmpty) {
        val a = o.putArray("removeDecimationLevels")
        removeLevels.foreach(a.add)
      }
      if (addOptions.nonEmpty) {
        val ao = o.putObject("addOptions")
        addOptions.foreach { case (k, v) => ao.put(k, v) }
      }
      if (removeOptions.nonEmpty) {
        val a = o.putArray("removeOptions"); removeOptions.foreach(a.add)
      }
      o
    }
  }

  private case class Rename(from: String, to: String) extends Cmd {
    def json: ObjectNode = {
      val o = mapper.createObjectNode()
      o.put("commandType", "rename_channel")
      o.put("oldChannelName", from)
      o.put("newChannelName", to)
      o
    }
  }

  private case class Remove(name: String) extends Cmd {
    def json: ObjectNode = {
      val o = mapper.createObjectNode()
      o.put("commandType", "remove_channel")
      o.put("channelName", name)
      o
    }
  }

  private def levelsGen: Gen[Map[Long, Long]] = for {
    ps <- Gen.someOf(Seq(0L, 30L, 300L, 3600L))
    rs <- Gen.listOfN(ps.size, Gen.oneOf(-7L, 0L, 3600L, 86400L))
  } yield ps.zip(rs).toMap

  private def optionsGen: Gen[Map[String, String]] =
    Gen.mapOf(Gen.zip(Gen.oneOf("unit", "rate", "k<&>'"),
      Gen.alphaNumStr.map(_.take(5))))

  private def cmdGen(names: Vector[String]): Gen[Cmd] = {
    val name = Gen.oneOf(names)
    Gen.frequency(
      4 -> (for {
        n <- name; en <- Gen.option(Gen.oneOf(true, false))
        lv <- levelsGen
      } yield Add(n, en, lv)),
      3 -> (for {
        n <- name; en <- Gen.oneOf(true, false)
        bare <- Gen.someOf(Seq(0L, 60L, 600L))
      } yield AddOrUpdate(n, en, bare.toSeq)),
      5 -> (for {
        n <- name
        en <- Gen.option(Gen.oneOf(true, false))
        repl <- Gen.option(levelsGen)
        al <- Gen.someOf(Seq(30L, 7200L))
        rl <- Gen.someOf(Seq(0L, 30L, 300L, 3600L, 7200L))
        ao <- optionsGen
        ro <- Gen.someOf(Seq("unit", "rate", "k<&>'", "ghost"))
      } yield Update(n, en, repl, al.toSeq, rl.toSeq, ao, ro.toSeq)),
      2 -> (for { a <- name; b <- name } yield Rename(a, b)),
      2 -> name.map(Remove(_)))
  }

  private def gen[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // ---- the model's command semantics --------------------------------

  /** Returns whether the command must succeed, mutating the model when
    * it does — the spec's independent reading of the wire contract.
    */
  private def applyModel(model: scala.collection.mutable.Map[String, Model],
                         cmd: Cmd): Boolean = cmd match {
    case Add(n, en, lv) =>
      if (model.contains(n)) false
      else {
        model(n) = norm(Model(en.getOrElse(true), lv, Map.empty)); true
      }
    case AddOrUpdate(n, en, bare) =>
      // add-or-update carries the COMPLETE desired configuration —
      // absent options mean empty, not keep
      // (ArchiveConfigurationUtils.copyAndVerifyOptionsMap:71-76
      // treats null as the empty map; only update_channel is partial)
      val lv = bare.map(_ -> 0L).toMap
      model(n) = norm(Model(en, lv, Map.empty))
      true
    case Update(n, en, repl, al, rl, ao, ro) =>
      model.get(n) match {
        case None => false
        case Some(old) =>
          val base = repl.getOrElse(old.levels)
          val levels = (base ++ al.map(_ -> 0L).toMap) -- rl
          val options = (old.options ++ ao) -- ro
          model(n) = norm(Model(en.getOrElse(old.enabled), levels, options))
          true
      }
    case Rename(a, b) =>
      (model.get(a), model.contains(b)) match {
        case (Some(m), false) => model.remove(a); model(b) = m; true
        case _ => false
      }
    case Remove(n) => model.remove(n).isDefined
  }

  // ---- HTTP plumbing -------------------------------------------------

  private def http(method: String, url: String,
                   body: Option[String] = None): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      val out = conn.getOutputStream
      out.write(b.getBytes(StandardCharsets.UTF_8)); out.close()
    }
    val code = conn.getResponseCode
    val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val text =
      if (in == null) ""
      else try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    conn.disconnect()
    (code, text)
  }

  /** The engine state as the API serves it, shaped like the model. */
  private def engineState(base: String): Map[String, Model] = {
    val (code, text) = http("GET", s"$base/1.0/channels/all")
    assert(code == 200, s"channels/all: $code $text")
    val root = mapper.readTree(text).get("channels").asInstanceOf[ArrayNode]
    (0 until root.size()).map(root.get).map { c =>
      val lv = c.get("decimationLevelToRetentionPeriod")
      val levels = lv.properties().iterator()
      val lvm = scala.collection.mutable.Map.empty[Long, Long]
      while (levels.hasNext) {
        val e = levels.next(); lvm(e.getKey.toLong) = e.getValue.asLong()
      }
      val op = c.get("options")
      val ops = scala.collection.mutable.Map.empty[String, String]
      val it = op.properties().iterator()
      while (it.hasNext) {
        val e = it.next(); ops(e.getKey) = e.getValue.asText()
      }
      c.get("channelName").asText() ->
        Model(c.get("enabled").asBoolean(), lvm.toMap, ops.toMap)
    }.toMap
  }

  test("random HTTP command batches: per-command success flags and the " +
      "served state track the model") {
    val cfgDir = Files.createTempDirectory("httpfz").toString
    val store = Files.createTempDirectory("httpfzs").toString
    val running = HttpArchiveServer.start(spark, cfgDir, store)
    val base = s"http://localhost:${running.port}/admin/api"
    try {
      var batches = 0
      var commands = 0
      for (seq <- 0 until 30) {
        val names = pool(seq)
        val model = scala.collection.mutable.Map.empty[String, Model]
        val nBatch = gen(Gen.choose(2, 4), 70000L + seq)
        (0 until nBatch).foreach { b =>
          val nCmd = gen(Gen.choose(1, 5), 71000L * seq + b)
          val cmds = (0 until nCmd).map(i =>
            gen(cmdGen(names), 72000L * seq + 100L * b + i))
          // expected flags against a SNAPSHOT-free sequential model —
          // the batch applies in order, later commands see earlier
          // effects (the reference's continuing batch)
          val expected = cmds.map(applyModel(model, _))
          val body = mapper.createObjectNode()
          val arr = body.putArray("commands")
          cmds.foreach(c => arr.add(c.json))
          val (code, text) = http("POST",
            s"$base/1.0/run-archive-configuration-commands",
            Some(mapper.writeValueAsString(body)))
          assert(code == 200, s"seq$seq/batch$b: $code $text")
          val results = mapper.readTree(text).get("results")
            .asInstanceOf[ArrayNode]
          val got = (0 until results.size())
            .map(i => results.get(i).get("success").asBoolean())
          assert(got == expected,
            s"seq$seq/batch$b flags diverged\ncmds=$cmds\ngot=$got" +
              s"\nexpected=$expected\nbody=$text")
          commands += nCmd
          // the served configuration equals the model after EVERY batch
          val engine = engineState(base)
            .view.filterKeys(k => names.contains(k)).toMap
          assert(engine == model.toMap,
            s"seq$seq/batch$b state diverged\nengine=$engine\nmodel=$model")
          batches += 1
        }
        // drain this sequence's channels so pools never collide
        val clean = ConfigCommands.state(spark, cfgDir).configs
          .filter(c => names.contains(c.name))
        clean.foreach(c =>
          ConfigCommands.removeChannel(spark, cfgDir, c.name, None))
      }
      info(s"$batches batches, $commands commands")
      assert(batches >= 60)
    } finally running.stop()
  }
}
