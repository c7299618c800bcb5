package graft

import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.archive.{ChannelConfig, ChannelConfigXml, ConfigCommands,
  ConfiguredArchive, HttpAdminApi, HttpArchiveServer}

/** Live-socket spec for the admin configuration API: every command
  * drives [[graft.archive.ConfigCommands]] over HTTP and the SERVING
  * path (the archive-access API on the same socket) reflects the
  * change on the next request — the round-trip the reference's admin
  * UI performs against ApiController.java.
  */
class HttpAdminApiSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private val NS = graft.core.Samples.NS
  private val T0 = 1704067200L * NS

  private lazy val fixture: (String, String, HttpArchiveServer.Running) = {
    val cfgDir = Files.createTempDirectory("admcfg").toString
    val store = Files.createTempDirectory("admstore").toString
    val running = HttpArchiveServer.start(spark, cfgDir, store)
    sys.addShutdownHook(running.stop())
    (cfgDir, store, running)
  }

  private def cfgDir: String = fixture._1
  private def storePath: String = fixture._2
  private def serveBase: String = fixture._3.baseUrl
  private def adminBase: String =
    s"http://localhost:${fixture._3.port}${HttpAdminApi.ContextPath}"

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

  private def enc(s: String): String =
    URLEncoder.encode(s, StandardCharsets.UTF_8).replace("+", "%20")

  private def runCommands(json: String): (Int, String) =
    http("POST", s"$adminBase/1.0/run-archive-configuration-commands",
      Some(json))

  test("admin UI: the static page serves and references only live API routes") {
    val (code, page) = http("GET",
      s"http://localhost:${fixture._3.port}${graft.archive.AdminUi.ContextPath}")
    assert(code == 200)
    assert(page.contains("<!doctype html>") &&
      page.contains("graft archive admin"))
    // every endpoint the page's script calls must exist on this server
    // (GET probes answer something other than route-miss 404; the
    // command endpoint rejects a GET with 405, which also proves the
    // route exists)
    for (p <- Seq("/1.0/server-status/this-server", "/1.0/channels/all",
        "/1.0/channels/by-server/graft/export")) {
      assert(page.contains(p), s"page no longer references $p")
      val (c, _) = http("GET", s"$adminBase$p")
      assert(c == 200, s"$p answered $c")
    }
    assert(page.contains("/1.0/run-archive-configuration-commands"))
    assert(page.contains("/1.0/channels/all/by-name/"))
  }

  test("add_channel over HTTP, then the serving path answers for it") {
    import spark.implicits._
    val (code, body) = runCommands(
      """{"commands":[{"commandType":"add_channel",
        |"channelName":"pv:adm","controlSystemType":"ca","enabled":true,
        |"decimationLevelToRetentionPeriod":{"0":0,"3600":0},
        |"options":{"monitor":"true"}}]}""".stripMargin)
    assert(code == 200)
    assert(body.contains("\"success\":true"))

    // the channel is listed with its config
    val (lc, lb) = http("GET", s"$adminBase/1.0/channels/all")
    assert(lc == 200 && lb.contains("\"channelName\":\"pv:adm\""))
    val (oc, ob) =
      http("GET", s"$adminBase/1.0/channels/all/by-name/${enc("pv:adm")}")
    assert(oc == 200 && ob.contains("\"monitor\":\"true\"")
      && ob.contains("\"3600\":0"))

    // ingest under the NEW config and serve over the SAME socket: the
    // admin change governs the engine end to end
    val raw = (1 to 120)
      .map(i => ("pv:adm", T0 + i * 60L * NS, i.toDouble, "", 0, 0, i.toLong))
      .toDF("channel", "ts", "value", "str_value", "severity", "status",
        "sample_id")
    ConfiguredArchive.ingestRaw(spark, cfgDir, storePath, raw)
    val (sc, sb) = http("GET", s"$serveBase/1/samples/${enc("pv:adm")}" +
      s"?start=$T0&end=${T0 + 200L * 60L * NS}")
    assert(sc == 200 && "\\{\"time\":".r.findAllIn(sb).size == 120)
  }

  test("update_channel partial semantics: options delta, levels kept, enabled flip") {
    val (code, body) = runCommands(
      """{"commands":[{"commandType":"update_channel",
        |"channelName":"pv:adm",
        |"addOptions":{"rate":"10"},"removeOptions":["monitor"]}]}"""
        .stripMargin)
    assert(code == 200 && body.contains("\"success\":true"))
    val cfg = ConfigCommands.state(spark, cfgDir).config("pv:adm").get
    assert(cfg.options == Map("rate" -> "10"))
    assert(cfg.levels.keySet == Set(0L, 3600L)) // untouched
    assert(cfg.enabled) // untouched
  }

  test("rename_channel: same data serves under the new name, old name 404s") {
    val before = http("GET", s"$serveBase/1/samples/${enc("pv:adm")}" +
      s"?start=$T0&end=${T0 + 200L * 60L * NS}")._2
    val (code, body) = runCommands(
      """{"commands":[{"commandType":"rename_channel",
        |"oldChannelName":"pv:adm","newChannelName":"pv:adm2"}]}"""
        .stripMargin)
    assert(code == 200 && body.contains("\"success\":true"))
    val after = http("GET", s"$serveBase/1/samples/${enc("pv:adm2")}" +
      s"?start=$T0&end=${T0 + 200L * 60L * NS}")._2
    assert(after == before)
    assert(http("GET", s"$serveBase/1/samples/${enc("pv:adm")}" +
      s"?start=$T0&end=${T0 + 200L * 60L * NS}")._1 == 404)
  }

  test("command batch continues past a failure, results in order") {
    val (code, body) = runCommands(
      """{"commands":[
        |{"commandType":"rename_channel",
        | "oldChannelName":"pv:ghost","newChannelName":"pv:x"},
        |{"commandType":"add_channel",
        | "channelName":"pv:batch","controlSystemType":"ca","enabled":true}
        |]}""".stripMargin)
    assert(code == 200)
    val successes = "\"success\":(true|false)".r
      .findAllMatchIn(body).map(_.group(1)).toSeq
    assert(successes == Seq("false", "true"))
    assert(body.contains("pv:ghost"))
    assert(ConfigCommands.state(spark, cfgDir).config("pv:batch").isDefined)
  }

  test("unknown commandType and malformed JSON are reported, not 500") {
    val (c1, b1) = runCommands(
      """{"commands":[{"commandType":"explode_channel"}]}""")
    assert(c1 == 200 && b1.contains("\"success\":false")
      && b1.contains("explode_channel"))
    assert(runCommands("""{"nope":1}""")._1 == 400)
    assert(runCommands("""{{{""")._1 == 400)
  }

  test("XML export/import round-trips the configuration over HTTP") {
    val (ec, xml) = http("GET",
      s"$adminBase/1.0/channels/by-server/${enc("srv-1")}/export")
    assert(ec == 200 && xml.contains("pv:adm2"))
    // import into a FRESH config log served by a second server
    val cfg2 = Files.createTempDirectory("admcfg2").toString
    val store2 = Files.createTempDirectory("admstore2").toString
    val running2 = HttpArchiveServer.start(spark, cfg2, store2)
    try {
      val (ic, ib) = http("POST",
        s"http://localhost:${running2.port}${HttpAdminApi.ContextPath}" +
          s"/1.0/channels/by-server/${enc("srv-1")}/import", Some(xml))
      assert(ic == 200 && ib.contains("addedOrUpdatedChannels"))
      val a = ConfigCommands.state(spark, cfgDir).configs.sortBy(_.name)
      val b = ConfigCommands.state(spark, cfg2).configs.sortBy(_.name)
      assert(a == b)
      // a malformed body is a 400, not a partial import
      assert(http("POST",
        s"http://localhost:${running2.port}${HttpAdminApi.ContextPath}" +
          s"/1.0/channels/by-server/x/import", Some("<not-xml"))._1 == 400)
    } finally running2.stop()
  }

  test("server-status reports live serving counters and versions; cluster-status lists this server") {
    // drive one cacheable samples request twice: the second is a
    // response-cache hit the counters must show
    val lo = T0; val hi = T0 + 10L * 60L * NS
    val url = s"$serveBase/1/samples/${enc("pv:batch")}?start=$lo&end=$hi"
    http("GET", url); http("GET", url)
    val (sc, sb) = http("GET", s"$adminBase/1.0/server-status/this-server")
    assert(sc == 200)
    assert(sb.contains("\"serverId\":\"graft\"") &&
      sb.contains("\"online\":true"))
    def counter(name: String): Long =
      ("\"" + name + "\":(\\d+)").r.findFirstMatchIn(sb).get.group(1).toLong
    assert(counter("totalRequests") >= 2L)
    assert(counter("samplesRequests") >= 2L)
    assert(counter("responseCacheHits") >= 1L)
    assert(counter("channelsTotal") >= 1L)
    assert(sb.contains("configVersion"))
    val (cc, cb) = http("GET", s"$adminBase/1.0/cluster-status")
    assert(cc == 200 && cb.contains("\"online\":true"))
  }

  test("adminAuth guards the admin context with HTTP Basic; serving stays anonymous") {
    val cfgA = Files.createTempDirectory("authcfg").toString
    val storeA = Files.createTempDirectory("authstore").toString
    val secured = HttpArchiveServer.start(spark, cfgA, storeA,
      adminAuth = Some("admin" -> "s3cret"))
    try {
      val adm = s"http://localhost:${secured.port}${HttpAdminApi.ContextPath}"
      // no credentials → 401 + challenge; wrong credentials → 401
      assert(http("GET", s"$adm/1.0/channels/all")._1 == 401)
      val bad = java.util.Base64.getEncoder
        .encodeToString("admin:wrong".getBytes(StandardCharsets.UTF_8))
      val cb = URI.create(s"$adm/1.0/channels/all").toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      cb.setRequestProperty("Authorization", s"Basic $bad")
      assert(cb.getResponseCode == 401); cb.disconnect()
      // right credentials → 200
      val ok = java.util.Base64.getEncoder
        .encodeToString("admin:s3cret".getBytes(StandardCharsets.UTF_8))
      val cg = URI.create(s"$adm/1.0/channels/all").toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      cg.setRequestProperty("Authorization", s"Basic $ok")
      assert(cg.getResponseCode == 200); cg.disconnect()
      // the archive-access context on the same socket stays anonymous
      // (the reference's split: Spring Security on admin only)
      assert(http("GET",
        s"http://localhost:${secured.port}" +
          s"${HttpArchiveServer.ContextPath}/")._1 == 200)
      // by-server listing is the same channel set in a single-server
      // deployment
      val cl = URI.create(s"$adm/1.0/channels/by-server/srv-1").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      cl.setRequestProperty("Authorization", s"Basic $ok")
      assert(cl.getResponseCode == 200); cl.disconnect()
    } finally secured.stop()
  }

  test("persisted users + roles: seeded admin, role-denied mutation, " +
      "password rotation without restart") {
    val cfgU = Files.createTempDirectory("usrcfg").toString
    val storeU = Files.createTempDirectory("usrstore").toString
    val usersDir = Files.createTempDirectory("usrlog").toString
    val secured = HttpArchiveServer.start(spark, cfgU, storeU,
      adminUsers = Some(usersDir))
    def authed(method: String, url: String, user: String, pass: String,
               body: Option[String] = None): (Int, String) = {
      val conn = URI.create(url).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setRequestMethod(method)
      conn.setRequestProperty("Authorization", "Basic " +
        java.util.Base64.getEncoder.encodeToString(
          s"$user:$pass".getBytes(StandardCharsets.UTF_8)))
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
    try {
      val adm = s"http://localhost:${secured.port}${HttpAdminApi.ContextPath}"
      // anonymous → 401; the first-start seeded admin/admin works
      assert(http("GET", s"$adm/1.0/channels/all")._1 == 401)
      val (lc, lb) = authed("GET", s"$adm/1.0/users", "admin", "admin")
      assert(lc == 200 && lb.contains("\"userName\":\"admin\"") &&
        lb.contains("archive-admin"))
      // admin adds a read-only user
      assert(authed("POST", s"$adm/1.0/users", "admin", "admin",
        Some("""{"userName":"reader","password":"pw1",
          |"roles":["archive-user"]}""".stripMargin))._1 == 200)
      // the read-only role: admin GETs pass, mutations are 403
      assert(authed("GET", s"$adm/1.0/channels/all",
        "reader", "pw1")._1 == 200)
      val (mc, mb) = authed("POST",
        s"$adm/1.0/run-archive-configuration-commands", "reader", "pw1",
        Some("""{"commands":[{"commandType":"add_channel",
          |"channelName":"x","controlSystemType":"ca"}]}""".stripMargin))
      assert(mc == 403 && mb.contains("archive-admin"))
      // the user list is admin information
      assert(authed("GET", s"$adm/1.0/users", "reader", "pw1")._1 == 403)
      // a user may NOT rotate someone else's password...
      assert(authed("POST", s"$adm/1.0/users/admin/password",
        "reader", "pw1", Some("""{"password":"hacked"}"""))._1 == 403)
      // ...but rotates their OWN, effective immediately, no restart
      assert(authed("POST", s"$adm/1.0/users/reader/password",
        "reader", "pw1", Some("""{"password":"pw2"}"""))._1 == 200)
      assert(authed("GET", s"$adm/1.0/channels/all",
        "reader", "pw1")._1 == 401)
      assert(authed("GET", s"$adm/1.0/channels/all",
        "reader", "pw2")._1 == 200)
      // admin rotation without restart, same contract
      assert(authed("POST", s"$adm/1.0/users/admin/password",
        "admin", "admin", Some("""{"password":"s3cret"}"""))._1 == 200)
      assert(authed("GET", s"$adm/1.0/users", "admin", "admin")._1 == 401)
      assert(authed("GET", s"$adm/1.0/users", "admin", "s3cret")._1 == 200)
      // the last admin cannot be removed (a store nobody can
      // administer is a locked door with the key inside)
      assert(authed("DELETE", s"$adm/1.0/users/admin",
        "admin", "s3cret")._1 == 400)
      // promote, then the old admin CAN go
      assert(authed("POST", s"$adm/1.0/users", "admin", "s3cret",
        Some("""{"userName":"root2","password":"pw",
          |"roles":["archive-admin"]}""".stripMargin))._1 == 200)
      assert(authed("DELETE", s"$adm/1.0/users/admin",
        "root2", "pw")._1 == 200)
      assert(authed("GET", s"$adm/1.0/users", "admin", "s3cret")._1 == 401)
      // role change: reader promoted to admin can now mutate
      assert(authed("POST", s"$adm/1.0/users/reader/roles", "root2", "pw",
        Some("""{"roles":["archive-admin"]}"""))._1 == 200)
      assert(authed("POST",
        s"$adm/1.0/run-archive-configuration-commands", "reader", "pw2",
        Some("""{"commands":[{"commandType":"add_channel",
          |"channelName":"pv:byreader","controlSystemType":"ca"}]}"""
          .stripMargin))._1 == 200)
    } finally secured.stop()
  }

  test("remove_channel: two-phase remove drops config AND archived data, serving 404s") {
    import org.apache.spark.sql.functions.col
    val id = ConfigCommands.state(spark, cfgDir).config("pv:adm2")
      .get.channelDataId
    val (code, body) = runCommands(
      """{"commands":[{"commandType":"remove_channel",
        |"channelName":"pv:adm2"}]}""".stripMargin)
    assert(code == 200 && body.contains("\"success\":true"))
    assert(http("GET", s"$serveBase/1/samples/${enc("pv:adm2")}" +
      s"?start=$T0&end=${T0 + NS}")._1 == 404)
    assert(ConfigCommands.state(spark, cfgDir).config("pv:adm2").isEmpty)
    assert(graft.archive.ManifestStore.read(spark, storePath, 0L)
      .where(col("channel") === id).count() == 0)
  }

  test("calc channel managed over the admin API: configured, computed at catch-up, served") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // two fresh sources + a calc channel defined purely through the
    // wire API (options carry the calc.* keys like any other option)
    val (code, body) = runCommands(
      """{"commands":[
        |{"commandType":"add_channel","channelName":"pv:ca",
        | "controlSystemType":"ca","enabled":true,
        | "decimationLevelToRetentionPeriod":{"0":0}},
        |{"commandType":"add_channel","channelName":"pv:cb",
        | "controlSystemType":"ca","enabled":true,
        | "decimationLevelToRetentionPeriod":{"0":0}},
        |{"commandType":"add_channel","channelName":"calc:ab",
        | "controlSystemType":"calc","enabled":true,
        | "decimationLevelToRetentionPeriod":{"0":0},
        | "options":{"calc.a":"pv:ca","calc.b":"pv:cb","calc.op":"sub",
        |            "calc.step_s":"600"}}]}""".stripMargin)
    assert(code == 200 &&
      "\"success\":true".r.findAllIn(body).size == 3, body)
    // ingest the sources, then the batch catch-up computes the calc
    // grid (the upkeep loop an operator schedules)
    def series(name: String, f: Long => Double) =
      (1L to 60L).map(i =>
        (name, T0 + i * 60L * NS, f(i), "", 0, 0, i))
        .toDF("channel", "ts", "value", "str_value", "severity",
          "status", "sample_id")
    ConfiguredArchive.ingestRaw(spark, cfgDir, storePath,
      series("pv:ca", _.toDouble)
        .unionByName(series("pv:cb", i => 3.0 * i)))
    ConfiguredArchive.catchUp(spark, cfgDir, storePath)
    // the derived series serves over the same socket under its name:
    // grid minutes 10..60, value m − 3m = −2m
    val (sc, sb) = http("GET", s"$serveBase/1/samples/${enc("calc:ab")}" +
      s"?start=$T0&end=${T0 + 200L * 60L * NS}")
    assert(sc == 200, sb)
    assert("\\{\"time\":".r.findAllIn(sb).size == 6, sb)
    assert(sb.contains("\"value\":[-20.0]") && sb.contains("\"value\":[-120.0]"), sb)
  }
}
