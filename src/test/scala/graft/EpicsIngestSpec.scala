package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.archive.{ArchiveServer, ChannelConfig, ConfigCommands,
  ConfiguredArchive, ManifestBackend}
import graft.sources.EpicsArchiverJson

/** The EPICS Archiver Appliance JSON ingest bridge: known-vector
  * decode (field defaults, DBR mapping, meta), shape inference without
  * DBRType, and the full migration path — export → typed store →
  * typed JSON serving (the gate `epics_json_ingest` holds the decoded
  * frame against the DuckDB oracle; this spec drives the store).
  */
class EpicsIngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("known-vector decode: DBR mapping, nanos default, enum states, " +
      "EGU/PREC onto the numeric metadata block") {
    val json =
      """[
        |{"meta":{"name":"pv:d","DBRType":"DBR_SCALAR_DOUBLE",
        |         "EGU":"A","PREC":"3"},
        | "data":[{"secs":100,"val":1.5,"nanos":7,"severity":1,"status":3},
        |         {"secs":101,"val":2.5}]},
        |{"meta":{"name":"pv:e","DBRType":"DBR_SCALAR_ENUM",
        |         "enum_strs":["Off","On"]},
        | "data":[{"secs":100,"val":1,"nanos":0,"severity":0,"status":0}]},
        |{"meta":{"name":"pv:w","DBRType":"DBR_WAVEFORM_INT"},
        | "data":[{"secs":100,"val":[1,2,3],"nanos":0,"severity":0,"status":0}]}
        |]""".stripMargin
    val rows = EpicsArchiverJson.parseExport(json)
    assert(rows.size == 4)
    val d0 = rows.head
    assert(d0.channel == "pv:d" && d0.ts == 100L * 1000000000L + 7L &&
      d0.vtype == "scalar_double" && d0.value.contains(1.5) &&
      d0.severity.contains(1) && d0.status.contains(3) &&
      d0.meta_units.contains("A") && d0.meta_precision.contains(3))
    val d1 = rows(1) // nanos/severity/status default to 0
    assert(d1.ts == 101L * 1000000000L && d1.severity.contains(0) &&
      d1.status.contains(0))
    val e = rows(2)
    assert(e.vtype == "scalar_enum" && e.enum_value.contains(1) &&
      e.labels.contains(Seq("Off", "On")) && e.value.isEmpty &&
      e.meta_units.isEmpty) // enums carry states, never the numeric block
    val w = rows(3)
    assert(w.vtype == "array_long" &&
      w.arr_num.contains(Seq(1.0, 2.0, 3.0)))
  }

  test("without DBRType the value shape infers the widest family") {
    val json =
      """[{"meta":{"name":"pv:x"},
        | "data":[{"secs":1,"val":2.5,"nanos":0},
        |         {"secs":2,"val":"hello","nanos":0},
        |         {"secs":3,"val":[1.0,2.0],"nanos":0},
        |         {"secs":4,"val":["a","b"],"nanos":0}]}]""".stripMargin
    val rows = EpicsArchiverJson.parseExport(json)
    assert(rows.map(_.vtype) == Seq("scalar_double", "scalar_string",
      "array_double", "array_string"))
  }

  test("full migration: export directory -> typed manifest store -> " +
      "typed JSON v1 serving") {
    val dir = Files.createTempDirectory("epics").toString
    val export = s"$dir/export"; val cfg = s"$dir/config"
    val store = s"$dir/store"
    EpicsArchiverJson.writeFixture(export)
    val frame = EpicsArchiverJson.read(spark, export)
    assert(frame.count() == 8L * 60L)
    (0 until 8).foreach(p =>
      ConfigCommands.addChannel(spark, cfg, ChannelConfig(s"epics:pv$p",
        s"epics-id$p", "ca", enabled = true, Map(), Map())))
    ConfiguredArchive.materializeTyped(spark, cfg, store, frame)
    val lo = 1704067200L * 1000000000L
    val hi = lo + 3600L * 1000000000L
    // a double PV serves the full wire format with its metadata block
    val served = ArchiveServer.serveJsonTyped(spark, store, "epics-id0",
      lo - 1, hi, backend = ManifestBackend).toVector
    assert(served.size == 60)
    assert(served.head.contains("\"type\":\"double\""))
    assert(served.head.contains("\"units\":\"mm\""))
    assert(served.head.contains("\"precision\":2"))
    // the enum PV serves its states
    val enumServed = ArchiveServer.serveJsonTyped(spark, store, "epics-id5",
      lo - 1, hi, backend = ManifestBackend).toVector
    assert(enumServed.size == 60)
    assert(enumServed.head.contains("\"type\":\"enum\""))
    assert(enumServed.head.contains("\"states\":[\"Off\",\"On\",\"Fault\"]"))
    // the waveform PV serves its elements
    val wServed = ArchiveServer.serveJsonTyped(spark, store, "epics-id7",
      lo - 1, hi, backend = ManifestBackend).toVector
    assert(wServed.size == 60)
    assert(wServed.head.contains("\"value\":[1750.0,875.0,-1750.0]"))
  }

  test("PB wire round trip: escape/unescape and known-vector decode") {
    import graft.sources.EpicsArchiverPb
    // escaping: the three escaped bytes survive a round trip inside a
    // payload
    val raw = Array[Byte](0x01, 0x1B, 0x0A, 0x0D, 0x7F, 0x1B, 0x02)
    val esc = EpicsArchiverPb.escape(raw)
    assert(!esc.contains(0x0A.toByte), "escaped payload must not " +
      "contain the line separator")
    assert(EpicsArchiverPb.unescape(esc, 0, esc.length).toSeq == raw.toSeq)
  }

  test("JSON and PB exports of the same data land IDENTICAL typed " +
      "stores (migration may take either path)") {
    import graft.sources.EpicsArchiverPb
    val dir = Files.createTempDirectory("epicsjp").toString
    EpicsArchiverJson.writeFixture(s"$dir/json")
    EpicsArchiverPb.writeFixture(s"$dir/pb")
    val fromJson = EpicsArchiverJson.read(spark, s"$dir/json")
    val fromPb = EpicsArchiverPb.read(spark, s"$dir/pb")
    assert(fromJson.count() == 480 && fromPb.count() == 480)
    val cols = fromJson.columns.sorted.toSeq
    val a = fromJson.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .orderBy("channel", "ts").collect().toSeq
    val b = fromPb.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .orderBy("channel", "ts").collect().toSeq
    assert(a == b, {
      val diff = a.zip(b).filter(p => p._1 != p._2).take(3)
      s"decoded frames differ, first diffs: $diff"
    })
    // and the two stores serve identical bytes end-to-end
    val (cfgJ, stJ) = (s"$dir/cfgj", s"$dir/stj")
    val (cfgP, stP) = (s"$dir/cfgp", s"$dir/stp")
    for (cfg <- Seq(cfgJ, cfgP); p <- 0 until 8)
      ConfigCommands.addChannel(spark, cfg, ChannelConfig(s"epics:pv$p",
        s"epics-id$p", "ca", enabled = true, Map(), Map()))
    ConfiguredArchive.materializeTyped(spark, cfgJ, stJ, fromJson)
    ConfiguredArchive.materializeTyped(spark, cfgP, stP, fromPb)
    val lo = 1704067200L * 1000000000L - 1
    val hi = lo + 4000L * 60L * 1000000000L
    for (p <- 0 until 8) {
      val sj = ConfiguredArchive.serveJsonTyped(spark, cfgJ, stJ,
        s"epics:pv$p", lo, hi, None, ManifestBackend).toVector
      val sp = ConfiguredArchive.serveJsonTyped(spark, cfgP, stP,
        s"epics:pv$p", lo, hi, None, ManifestBackend).toVector
      assert(sj == sp, s"pv$p served different bytes from the two bridges")
      assert(sj.size == 60)
    }
  }
}
