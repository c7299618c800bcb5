package graft.archive

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.HttpExchange
import org.apache.spark.sql.SparkSession

/** The reference's ADMIN configuration API, re-expressed over
  * [[ConfigCommands]] — the HTTP surface an operator uses to manage
  * channels without writing Scala. Fresh implementation of the
  * CONTRACT of ApiController.java (cassandra-pv-archiver-server/.../
  * web/admin/controller/ApiController.java:225-762) and its wsapi
  * shapes, served on the same socket as [[HttpArchiveServer]]:
  *
  *   - `GET  <ctx>/1.0/channels/all` — every configured channel
  *     (ChannelsAllResponse: a `channels` array, name-sorted)
  *   - `GET  <ctx>/1.0/channels/all/by-name/<channel>` — one channel's
  *     configuration, or 404 (:253-268)
  *   - `GET  <ctx>/1.0/channels/by-server/<serverId>/export` — the S12
  *     XML configuration file (:474-528, ChannelConfigXml)
  *   - `POST <ctx>/1.0/channels/by-server/<serverId>/import` — an XML
  *     configuration file as the request body; every channel is
  *     add-or-updated (:530-724; the reference wraps the file in a
  *     JSON envelope with per-flag add/update/remove switches — this
  *     edge takes the XML directly, the envelope being a Spring
  *     upload-form artifact, and applies its default switches:
  *     add + update)
  *   - `GET  <ctx>/1.0/server-status/this-server` — live serving
  *     counters (total/samples requests, response-cache hits, errors)
  *     plus config/store versions (:804, ServerStatusResponse);
  *     `GET <ctx>/1.0/cluster-status` — the single always-online
  *     server (:726; Spark's runtime replaces the reference's
  *     inter-node cluster half)
  *   - `POST <ctx>/1.0/run-archive-configuration-commands` — the
  *     command batch (:762-802): a JSON object
  *     `{"commands":[{"commandType":...}]}` using the reference's
  *     Jackson wire names (ArchiveConfigurationCommand.java:67-75:
  *     `add_channel`, `add_or_update_channel`, `update_channel`,
  *     `rename_channel`, `remove_channel`), answered by a
  *     RunArchiveConfigurationCommandsResponse-shaped
  *     `{"errorMessage":null,"results":[{"success":...,
  *     "errorMessage":...}]}` with one result per command, in order —
  *     a failed command reports its error and the batch CONTINUES,
  *     like the reference's per-command result list.
  *
  * Commands mutate the same versioned config log the serving edge
  * plans from, so a change is visible to `GET /1/samples/...` at the
  * next request (the serving caches key on the config version).
  * `remove_channel` is the full two-phase remove INCLUDING archived
  * data when the store is manifest-backed, exactly like
  * [[ConfigCommands.removeChannel]].
  */
object HttpAdminApi {

  /** The reference's admin servlet context. */
  val ContextPath = "/admin/api"

  private val mapper = new ObjectMapper()

  /** An authenticated admin-surface principal. `admin = false` is the
    * reference's archive-user tier: read-only on the admin surface
    * (GETs allowed, mutating requests 403), with the one self-service
    * exception of changing one's OWN password.
    */
  private final case class Principal(name: String, admin: Boolean)

  /** Decode the Basic Authorization header into (user, password). */
  private def basicCreds(ex: HttpExchange): Option[(String, String)] =
    Option(ex.getRequestHeaders.getFirst("Authorization"))
      .filter(_.startsWith("Basic "))
      .flatMap { h =>
        try {
          val s = new String(java.util.Base64.getDecoder.decode(
            h.stripPrefix("Basic ").trim), StandardCharsets.UTF_8)
          val i = s.indexOf(':')
          if (i < 0) None else Some(s.substring(0, i) -> s.substring(i + 1))
        } catch { case _: IllegalArgumentException => None }
      }

  /** Stores whose first-start admin seed has SUCCEEDED. Seeding runs
    * inside `computeIfAbsent`, which both serializes concurrent first
    * requests on one path (no duplicate seed commits racing) and — by
    * mapping the path only after [[UserStore.ensureSeeded]] returns —
    * retries a transiently-failed seed on the next request instead of
    * 401-ing until restart.
    */
  private val seededStores =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Authentication for the admin surface — the re-expression of the
    * reference's admin-side security (Spring Security over
    * ArchiveUserDetailsManager.java; archive-access is anonymous
    * there and stays anonymous here). Three modes, by configuration:
    *
    *  - `users` (a [[UserStore]] log path): PERSISTED users with
    *    roles — add/remove/password-change over the API, effective on
    *    the next request, seeded `admin`/`admin` on first start like
    *    the reference;
    *  - `auth` (a static pair, the round-9 surface): that one
    *    credential, with the admin role (constant-time compare);
    *  - neither: open, admin (test/dev parity).
    */
  private def resolvePrincipal(spark: SparkSession, ex: HttpExchange,
                               auth: Option[(String, String)],
                               users: Option[String]): Option[Principal] =
    users match {
      case Some(path) =>
        seededStores.computeIfAbsent(path, _ => {
          UserStore.ensureSeeded(spark, path)
          java.lang.Boolean.TRUE
        })
        basicCreds(ex).flatMap { case (u, p) =>
          UserStore.authenticate(spark, path, u, p)
            .map(user => Principal(user.name, user.isAdmin))
        }
      case None =>
        auth match {
          case None => Some(Principal("anonymous", admin = true))
          case Some((u, p)) =>
            val expected = java.util.Base64.getEncoder.encodeToString(
              s"$u:$p".getBytes(StandardCharsets.UTF_8))
            Option(ex.getRequestHeaders.getFirst("Authorization")) match {
              case Some(h) if h.startsWith("Basic ") &&
                  java.security.MessageDigest.isEqual(
                    h.stripPrefix("Basic ").trim
                      .getBytes(StandardCharsets.UTF_8),
                    expected.getBytes(StandardCharsets.UTF_8)) =>
                Some(Principal(u, admin = true))
              case _ => None
            }
        }
    }

  private[archive] def handle(spark: SparkSession, configPath: String,
                              storePath: Option[String],
                              ex: HttpExchange,
                              auth: Option[(String, String)] = None,
                              stats: Option[HttpArchiveServer.Stats] = None,
                              storeVersion: () => Option[Long] = () => None,
                              users: Option[String] = None,
                              registryDir: Option[String] = None,
                              serverId: String = "graft")
      : Unit = {
    val principal = resolvePrincipal(spark, ex, auth, users) match {
      case Some(p) => p
      case None =>
        ex.getResponseHeaders.set("WWW-Authenticate",
          "Basic realm=\"graft-admin\"")
        send(ex, 401, "text/plain", "authentication required")
        return
    }
    val rawPath = ex.getRequestURI.getRawPath.stripPrefix(ContextPath)
    // role gate: mutations need the admin role — except the
    // self-service password change, handled inside userRoutes
    val selfPasswordChange =
      ex.getRequestMethod == "POST" &&
        rawPath.startsWith("/1.0/users/") && rawPath.endsWith("/password")
    if (ex.getRequestMethod != "GET" && !principal.admin &&
        !selfPasswordChange) {
      send(ex, 403, "text/plain",
        s"role '${UserStore.AdminRole}' required")
      return
    }
    if (rawPath.startsWith("/1.0/users")) {
      users match {
        case Some(path) =>
          userRoutes(spark, path, ex, rawPath, principal)
        case None => send(ex, 404, "text/plain",
          "user management requires a configured user store")
      }
      return
    }
    (ex.getRequestMethod, rawPath) match {
      case ("GET", "/1.0/server-status/this-server") =>
        serverStatus(spark, configPath, ex, stats, storeVersion)
      case ("GET", "/1.0/cluster-status") =>
        registryDir match {
          case Some(dir) =>
            // fleet deployment: the live server registry (renewal-aged
            // liveness, ClusterManagementService.java:93 semantics)
            clusterStatus(spark, dir, serverId, ex)
          case None =>
            // single-server deployment: Spark's own runtime replaces
            // the reference's inter-node cluster half (SURVEY scope),
            // so the cluster is this one always-online server
            send(ex, 200, "application/json; charset=UTF-8",
              """[{"serverId":"graft","serverName":"graft","online":true}]""")
        }
      case ("GET", "/1.0/channels/all") =>
        channelsAll(spark, configPath, ex)
      case ("GET", p) if p.startsWith("/1.0/channels/all/by-name/") =>
        channelByName(spark, configPath, ex,
          decode(p.stripPrefix("/1.0/channels/all/by-name/")))
      case ("GET", p) if p.startsWith("/1.0/channels/by-server/") &&
          p.endsWith("/export") =>
        val sid = decode(p.stripPrefix("/1.0/channels/by-server/")
          .stripSuffix("/export"))
        exportXml(spark, configPath, ex, sid)
      case ("POST", p) if p.startsWith("/1.0/channels/by-server/") &&
          p.endsWith("/import") =>
        importXml(spark, configPath, ex)
      case ("GET", p) if p.startsWith("/1.0/channels/by-server/") =>
        // single-server deployment: every configured channel belongs
        // to this server (ApiController.java:341-472's by-server list)
        channelsAll(spark, configPath, ex)
      case ("POST", "/1.0/run-archive-configuration-commands") =>
        runCommands(spark, configPath, storePath, ex)
      case ("GET", _) | ("POST", _) => send(ex, 404, "text/plain", "not found")
      case _ => send(ex, 405, "text/plain", "GET/POST only")
    }
  }

  // ---- reads ---------------------------------------------------------

  private def channelJson(c: ChannelConfig): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("channelName", c.name)
    o.put("channelDataId", c.channelDataId)
    o.put("controlSystemType", c.controlSystemType)
    o.put("enabled", c.enabled)
    val lv = o.putObject("decimationLevelToRetentionPeriod")
    c.levels.toSeq.sortBy(_._1).foreach { case (p, r) =>
      lv.put(p.toString, r)
    }
    val op = o.putObject("options")
    c.options.toSeq.sortBy(_._1).foreach { case (k, v) => op.put(k, v) }
    o
  }

  private def channelsAll(spark: SparkSession, configPath: String,
                          ex: HttpExchange): Unit = {
    val root = mapper.createObjectNode()
    val arr = root.putArray("channels")
    ConfigCommands.state(spark, configPath).configs.sortBy(_.name)
      .foreach(c => arr.add(channelJson(c)))
    send(ex, 200, "application/json; charset=UTF-8",
      mapper.writeValueAsString(root))
  }

  private def channelByName(spark: SparkSession, configPath: String,
                            ex: HttpExchange, name: String): Unit =
    ConfigCommands.state(spark, configPath).config(name) match {
      case Some(c) => send(ex, 200, "application/json; charset=UTF-8",
        mapper.writeValueAsString(channelJson(c)))
      case None => send(ex, 404, "text/plain", "not found")
    }

  /** The reference's server-status endpoint (ApiController.java:804,
    * ServerStatusResponse) with this edge's real serving counters —
    * total/samples request counts, response-cache hits, 500s — plus
    * the live config and store versions (what an operator checks when
    * a dashboard goes stale: did anything commit?).
    */
  private def serverStatus(spark: SparkSession, configPath: String,
                           ex: HttpExchange,
                           stats: Option[HttpArchiveServer.Stats],
                           storeVersion: () => Option[Long]): Unit = {
    val o = mapper.createObjectNode()
    o.put("serverId", "graft")
    o.put("serverName", "graft")
    o.put("online", true)
    o.put("channelsTotal",
      ConfigCommands.state(spark, configPath).configs.size)
    o.put("configVersion", ConfigCommands.state(spark, configPath).version)
    storeVersion() match {
      case Some(v) => o.put("storeVersion", v)
      case None => o.putNull("storeVersion")
    }
    stats.foreach { s =>
      o.put("totalRequests", s.requests.get())
      o.put("samplesRequests", s.samplesRequests.get())
      o.put("responseCacheHits", s.responseCacheHits.get())
      o.put("errors", s.errors.get())
    }
    send(ex, 200, "application/json; charset=UTF-8",
      mapper.writeValueAsString(o))
  }

  /** The fleet from the [[ServerRegistry]], the reference's
    * cluster-status shape (ApiController.java:726) plus the registry's
    * url/renewal detail; `thisServer` marks the answering instance.
    */
  private def clusterStatus(spark: SparkSession, registryDir: String,
                            serverId: String, ex: HttpExchange): Unit = {
    val arr = mapper.createArrayNode()
    ServerRegistry.list(spark, registryDir).foreach { s =>
      val o = arr.addObject()
      o.put("serverId", s.serverId)
      o.put("serverName", s.serverName)
      o.put("url", s.url)
      o.put("online", s.online)
      o.put("startedAt", s.startedAt)
      o.put("renewedAt", s.renewedAt)
      o.put("thisServer", s.serverId == serverId)
    }
    send(ex, 200, "application/json; charset=UTF-8",
      mapper.writeValueAsString(arr))
  }

  private def exportXml(spark: SparkSession, configPath: String,
                        ex: HttpExchange, serverId: String): Unit = {
    val xml = ChannelConfigXml.exportXml(serverId,
      ConfigCommands.state(spark, configPath).configs)
    send(ex, 200, "application/xml; charset=UTF-8", xml)
  }

  // ---- writes --------------------------------------------------------

  private def importXml(spark: SparkSession, configPath: String,
                        ex: HttpExchange): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(),
      StandardCharsets.UTF_8)
    try {
      val (_, channels) = ChannelConfigXml.importXml(body)
      channels.foreach(c => ConfigCommands.addOrUpdateChannel(spark,
        configPath, c))
      val o = mapper.createObjectNode()
      o.put("addedOrUpdatedChannels", channels.size)
      send(ex, 200, "application/json; charset=UTF-8",
        mapper.writeValueAsString(o))
    } catch {
      case e: Exception =>
        send(ex, 400, "text/plain", s"import failed: ${e.getMessage}")
    }
  }

  private def runCommands(spark: SparkSession, configPath: String,
                          storePath: Option[String],
                          ex: HttpExchange): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(),
      StandardCharsets.UTF_8)
    val root =
      try mapper.readTree(body)
      catch {
        case e: Exception =>
          send(ex, 400, "text/plain", s"bad JSON: ${e.getMessage}"); return
      }
    val cmds = Option(root.get("commands")).collect {
      case a: ArrayNode => a.elements().asScala.toSeq
    }
    if (cmds.isEmpty) {
      send(ex, 400, "text/plain", "missing 'commands' array"); return
    }
    val resp = mapper.createObjectNode()
    resp.putNull("errorMessage")
    val results = resp.putArray("results")
    cmds.get.foreach { c =>
      val r = results.addObject()
      try {
        applyCommand(spark, configPath, storePath, c)
        r.put("success", true); r.putNull("errorMessage")
      } catch {
        case e: Exception =>
          r.put("success", false)
          r.put("errorMessage", Option(e.getMessage).getOrElse(e.toString))
      }
    }
    send(ex, 200, "application/json; charset=UTF-8",
      mapper.writeValueAsString(resp))
  }

  private def str(c: JsonNode, field: String): String = {
    val n = c.get(field)
    require(n != null && n.isTextual, s"missing required field '$field'")
    n.asText()
  }

  /** decimationLevelToRetentionPeriod (period → retention seconds),
    * merged with bare decimationLevels (retention 0), the reference's
    * dual encoding. Absent both → raw only (normalize adds level 0).
    */
  private def levelsOf(c: JsonNode): Map[Long, Long] = {
    val fromMap = Option(c.get("decimationLevelToRetentionPeriod"))
      .filter(_.isObject)
      .map(_.properties().asScala
        .map(e => e.getKey.toLong -> e.getValue.asLong()).toMap)
      .getOrElse(Map.empty[Long, Long])
    val fromSet = Option(c.get("decimationLevels")).filter(_.isArray)
      .map(_.elements().asScala.map(_.asLong() -> 0L).toMap)
      .getOrElse(Map.empty[Long, Long])
    fromSet ++ fromMap
  }

  private def optionsOf(c: JsonNode, field: String): Map[String, String] =
    Option(c.get(field)).filter(_.isObject)
      .map(_.properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap)
      .getOrElse(Map.empty)

  private def applyCommand(spark: SparkSession, configPath: String,
                           storePath: Option[String], c: JsonNode): Unit =
    str(c, "commandType") match {
      case "add_channel" =>
        ConfigCommands.addChannel(spark, configPath, ChannelConfig(
          str(c, "channelName"),
          // the reference generates the channel's permanent data id
          // server-side on add (AddChannelCommand carries none)
          java.util.UUID.randomUUID().toString,
          str(c, "controlSystemType"),
          Option(c.get("enabled")).forall(_.asBoolean(true)),
          optionsOf(c, "options"), levelsOf(c)))
      case "add_or_update_channel" =>
        val name = str(c, "channelName")
        val existing = ConfigCommands.state(spark, configPath).config(name)
        ConfigCommands.addOrUpdateChannel(spark, configPath, ChannelConfig(
          name,
          existing.map(_.channelDataId)
            .getOrElse(java.util.UUID.randomUUID().toString),
          str(c, "controlSystemType"),
          Option(c.get("enabled")).forall(_.asBoolean(true)),
          optionsOf(c, "options"), levelsOf(c)))
      case "update_channel" =>
        val name = str(c, "channelName")
        val old = ConfigCommands.state(spark, configPath).config(name)
          .getOrElse(throw new NoSuchChannelException(name))
        // partial-update semantics (UpdateChannelCommand.java:44-54):
        // absent fields keep their value; set-replacement and
        // add/remove deltas are both supported for levels and options
        val enabled = Option(c.get("enabled")).filter(_.isBoolean)
          .map(_.asBoolean()).getOrElse(old.enabled)
        val baseLevels =
          if (c.has("decimationLevels") ||
              c.has("decimationLevelToRetentionPeriod")) levelsOf(c)
          else old.levels
        val levels = (baseLevels ++
          Option(c.get("addDecimationLevels")).filter(_.isArray)
            .map(_.elements().asScala.map(_.asLong() -> 0L).toMap)
            .getOrElse(Map.empty)) --
          Option(c.get("removeDecimationLevels")).filter(_.isArray)
            .map(_.elements().asScala.map(_.asLong()).toSet)
            .getOrElse(Set.empty[Long])
        val baseOptions =
          if (c.has("options")) optionsOf(c, "options") else old.options
        val options = (baseOptions ++ optionsOf(c, "addOptions")) --
          Option(c.get("removeOptions")).filter(_.isArray)
            .map(_.elements().asScala.map(_.asText()).toSet)
            .getOrElse(Set.empty[String])
        ConfigCommands.updateChannel(spark, configPath, old.copy(
          enabled = enabled, levels = levels, options = options))
      case "rename_channel" =>
        ConfigCommands.renameChannel(spark, configPath,
          str(c, "oldChannelName"), str(c, "newChannelName"))
      case "remove_channel" =>
        ConfigCommands.removeChannel(spark, configPath,
          str(c, "channelName"), storePath)
      case other =>
        throw new IllegalArgumentException(s"unknown commandType '$other'")
    }

  // ---- user management ----------------------------------------------

  /** The reference's user CRUD (ArchiveUserDetailsManager.java) as
    * admin-API routes over the [[UserStore]] log:
    *
    *   - `GET    <ctx>/1.0/users` — names + roles (admin only; the
    *     list of who can administer is itself admin information)
    *   - `POST   <ctx>/1.0/users` —
    *     `{"userName":…,"password":…,"roles":["archive-admin"|…]}`
    *   - `DELETE <ctx>/1.0/users/<name>` — remove (last admin refused)
    *   - `POST   <ctx>/1.0/users/<name>/password` — `{"password":…}`;
    *     admins rotate anyone, any user rotates their OWN — effective
    *     on the next request, no restart
    *   - `POST   <ctx>/1.0/users/<name>/roles` — `{"roles":[…]}`
    */
  private def userRoutes(spark: SparkSession, path: String,
                         ex: HttpExchange, rawPath: String,
                         principal: Principal): Unit = {
    def body: JsonNode = mapper.readTree(
      new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
    def rolesOf(n: JsonNode): Set[String] =
      Option(n.get("roles")).filter(_.isArray)
        .map(_.elements().asScala.map(_.asText()).toSet)
        .getOrElse(Set(UserStore.UserRole))
    try {
      (ex.getRequestMethod, rawPath) match {
        case ("GET", "/1.0/users") =>
          if (!principal.admin) {
            send(ex, 403, "text/plain",
              s"role '${UserStore.AdminRole}' required"); return
          }
          val root = mapper.createObjectNode()
          val arr = root.putArray("users")
          UserStore.state(spark, path).users.sortBy(_.name).foreach { u =>
            val o = arr.addObject()
            o.put("userName", u.name)
            val r = o.putArray("roles")
            u.roles.toSeq.sorted.foreach(r.add)
          }
          send(ex, 200, "application/json; charset=UTF-8",
            mapper.writeValueAsString(root))
        case ("POST", "/1.0/users") =>
          val b = body
          UserStore.addUser(spark, path, str(b, "userName"),
            str(b, "password"), rolesOf(b))
          send(ex, 200, "application/json; charset=UTF-8",
            """{"success":true}""")
        case ("DELETE", p) if p.startsWith("/1.0/users/") =>
          UserStore.removeUser(spark, path,
            decode(p.stripPrefix("/1.0/users/")))
          send(ex, 200, "application/json; charset=UTF-8",
            """{"success":true}""")
        case ("POST", p) if p.startsWith("/1.0/users/") &&
            p.endsWith("/password") =>
          val name = decode(p.stripPrefix("/1.0/users/")
            .stripSuffix("/password"))
          // the role gate upstream admits admins and the self-change;
          // re-check here so the route can never be reached for
          // another user's password by a non-admin
          if (!principal.admin && name != principal.name) {
            send(ex, 403, "text/plain", "may only change own password")
            return
          }
          UserStore.setPassword(spark, path, name, str(body, "password"))
          send(ex, 200, "application/json; charset=UTF-8",
            """{"success":true}""")
        case ("POST", p) if p.startsWith("/1.0/users/") &&
            p.endsWith("/roles") =>
          val name = decode(p.stripPrefix("/1.0/users/")
            .stripSuffix("/roles"))
          UserStore.setRoles(spark, path, name, rolesOf(body))
          send(ex, 200, "application/json; charset=UTF-8",
            """{"success":true}""")
        case ("GET", _) | ("POST", _) | ("DELETE", _) =>
          send(ex, 404, "text/plain", "not found")
        case _ => send(ex, 405, "text/plain", "GET/POST/DELETE only")
      }
    } catch {
      case e: IllegalArgumentException =>
        send(ex, 400, "text/plain", Option(e.getMessage).getOrElse("bad request"))
      case e: NoSuchElementException =>
        send(ex, 404, "text/plain", Option(e.getMessage).getOrElse("not found"))
    }
  }

  // ---- plumbing ------------------------------------------------------

  private def decode(raw: String): String =
    java.net.URLDecoder.decode(raw, StandardCharsets.UTF_8)

  private def send(ex: HttpExchange, code: Int, ctype: String,
                   body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", ctype)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.getResponseBody.close()
  }
}
