package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.schema.SchemaRegistry

/** Team catalog + client registration surface (reference: team.py,
  * client.py:39-146, registrar.py).
  *
  * Every producer/consumer client declares a `team_name`; the reference
  * validates it against the teams configuration file on construction and
  * refuses unknown teams — registration messages from an unvalidated team
  * would be unroutable (the team's notification email is how data-change
  * notices reach the client's owners). The registrar itself is the
  * schema-usage heartbeat: a map of schema_id → last-seen timestamp,
  * periodically flushed as registration messages.
  */
object Team {

  /** One team row from the teams config (reference: team.py:18-47 —
    * the config maps team name → metadata incl. notification_email). */
  final case class TeamInfo(name: String, notificationEmail: Option[String])

  /** Unknown/unregistered team (reference: client.py:140-146 — the
    * team_name setter raises; docstring calls it InvalidTeamError). */
  final class InvalidTeamError(teamName: String)
      extends IllegalArgumentException(
        s"Team name must exist: '$teamName' is not a registered team. " +
          "See the team_name argument documentation for adding a team.")

  /** The teams catalog (reference: Team.config/team_names/exists). */
  final class Teams(byName: Map[String, TeamInfo]) extends Serializable {
    def teamNames: Set[String] = byName.keySet
    def exists(teamName: String): Boolean = byName.contains(teamName)
    def get(teamName: String): Option[TeamInfo] = byName.get(teamName)

    /** Validate-or-throw (the client constructor path). A team must also
      * carry a notification_email to register producers/consumers —
      * a DISTINCT error from an unknown team (reference client.py:69-72
      * vs 140-146): collapsing them sent operators who could see their
      * team plainly in the config down the wrong debugging path. */
    def validate(teamName: String): TeamInfo = {
      val t = byName.getOrElse(teamName, throw new InvalidTeamError(teamName))
      require(t.notificationEmail.exists(_.nonEmpty),
        s"Team '$teamName' is registered but has no notification_email; " +
          "add one to the teams config to register clients for it.")
      t
    }
  }

  def apply(teams: TeamInfo*): Teams =
    new Teams(teams.map(t => t.name -> t).toMap)

  /** Parse the teams config (reference: team.py:18-30 loads teams.yaml —
    * `teams:` → team name → `notification_email:`). This accepts exactly
    * that two-level subset; unknown keys are ignored, comments and blank
    * lines skipped. */
  def parseConfig(text: String): Teams = {
    var inTeams = false
    var teamIndent: Option[Int] = None // indent of team-name entries
    var currentTeam: Option[String] = None
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, Option[String]]
    text.linesIterator.foreach { raw =>
      // YAML comment rules: '#' starts a comment only at line start or
      // after whitespace — a '#' INSIDE a value (ops#oncall@example.com)
      // is data, and stripping it would silently corrupt the value
      val line = raw.replaceAll("(^|\\s)#.*$", "")
      if (line.trim.nonEmpty) {
        val indent = line.takeWhile(_ == ' ').length
        val body = line.trim
        if (indent == 0) {
          inTeams = body == "teams:"
          teamIndent = None
          currentTeam = None
        } else if (inTeams) {
          if (teamIndent.isEmpty) teamIndent = Some(indent)
          if (teamIndent.contains(indent) && body.endsWith(":")) {
            val name = body.dropRight(1)
            acc.put(name, None)
            currentTeam = Some(name)
          } else if (teamIndent.exists(indent > _) && currentTeam.isDefined &&
              body.startsWith("notification_email:")) {
            // strip matching YAML quotes: `"a@b.com"` is idiomatic
            // quoting, and storing the quote characters would bounce
            // every notification sent to the literal-quoted address
            val raw = body.stripPrefix("notification_email:").trim
            val email =
              if (raw.length >= 2 &&
                  ((raw.head == '"' && raw.last == '"') ||
                   (raw.head == '\'' && raw.last == '\'')))
                raw.substring(1, raw.length - 1).trim
              else raw
            if (email.nonEmpty) acc.put(currentTeam.get, Some(email))
          }
        }
      }
    }
    new Teams(acc.map { case (n, e) => n -> TeamInfo(n, e) }.toMap)
  }
}

/** Client heartbeat cadences (reference: expected_frequency.py). */
object ExpectedFrequency {
  val Constantly = 0
  val Hourly: Int = 60 * 60
  val Daily: Int = Hourly * 24
  val Weekly: Int = Daily * 7
  val Monthly: Int = Daily * 30
  val Yearly: Int = Daily * 365
}

/** Producer/consumer registration heartbeat (reference: registrar.py).
  *
  * Validates the team on construction ([[Team.InvalidTeamError]] parity
  * with client.py:116-146), folds schema_id → max last-seen timestamp as
  * the client processes messages, and renders the state as registration
  * message payload rows in the reference's
  * `registration_message_v1.avsc` shape. The registration schema itself
  * is registered through the normal registry path, so registration
  * traffic is introspectable like any other source.
  */
final class Registrar(
    teams: Team.Teams,
    val teamName: String,
    val clientName: String,
    val clientType: String,
    val expectedFrequencySeconds: Int) {

  require(clientType == "producer" || clientType == "consumer",
    s"client_type must be 'producer' or 'consumer', got '$clientType'")
  val team: Team.TeamInfo = teams.validate(teamName)

  private val lastSeenBySchema = TrieMap.empty[Int, Long]

  /** Record a message read/written with `schemaId` at `timestampMillis`
    * (reference: registrar.py update path — keeps the max). */
  def recordUsage(schemaId: Int, timestampMillis: Long): Unit =
    lastSeenBySchema.updateWith(schemaId) {
      case Some(prev) => Some(math.max(prev, timestampMillis))
      case None => Some(timestampMillis)
    }

  def lastSeen: Map[Int, Long] = lastSeenBySchema.toMap

  /** Registration payload rows, one per used schema (reference:
    * registrar.py:102-110 _registration_message_payload; field names are
    * the registration_message_v1.avsc contract). */
  def registrationMessages: Seq[(String, String, String, Long, Int, Int)] =
    lastSeenBySchema.toSeq.sortBy(_._1).map { case (schemaId, ts) =>
      (teamName, clientName, clientType, ts, expectedFrequencySeconds, schemaId)
    }

  def registrationMessagesDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    registrationMessages.toDF("team_name", "client_name", "client_type",
      "timestamp", "expected_frequency_seconds", "schema_id")
  }

  /** Avro schema for registration messages: the CANONICAL
    * [[graft.core.Envelope.registrationMessageSchemaJson]] — one
    * registration_message_v1 definition in the codebase, not a second
    * divergent copy (a string-typed client_type twin here once made
    * Registrar-written messages unreadable under the canonical enum
    * schema and vice versa; the string→enum encode is handled by
    * AvroConversions and the require above pins the symbol domain). */
  val registrationSchemaJson: String =
    graft.core.Envelope.registrationMessageSchemaJson

  /** Register the registration-message schema itself (reference:
    * registrar.py:113-122 registration_schema — registered under the
    * pipeline's own namespace with the PLATFORM owner email, a fixed
    * constant: registering with the calling team's address made the
    * shared schema's ownership churn last-writer-wins across tenants,
    * routing platform schema-change notices to an arbitrary team. */
  def registrationSchema(registry: SchemaRegistry,
                         platformOwnerEmail: String =
                           Registrar.PlatformOwnerEmail): registry.SchemaEntry =
    registry.registerSchema("graft.registration",
      "client_registration_message_v1", registrationSchemaJson,
      sourceOwnerEmail = platformOwnerEmail)
}

object Registrar {
  /** Owner of the platform-level registration stream (deployments
    * override per install; reference registrar.py:119 hardcodes its
    * platform list address the same way). */
  val PlatformOwnerEmail: String = "platform@graft.invalid"
}
