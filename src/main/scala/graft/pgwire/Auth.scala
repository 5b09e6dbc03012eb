package graft.pgwire

import scala.collection.mutable

/** Users, roles, grants and role inheritance — the reference's
  * AuthManager model (datafusion-postgres/src/auth.rs:13-459):
  * predefined `readonly` / `readwrite` / `dbadmin` roles, recursive
  * role-inheritance resolution, per-table or wildcard grants, and a
  * default `postgres` superuser.
  */
object Permission extends Enumeration {
  val Select, Insert, Update, Delete, Create, Drop, Alter, Truncate = Value

  /** Statement head keyword → permission it requires (None = always
    * allowed; reference: hooks/permissions.rs:18-144).
    */
  def forStatement(head: String): Option[Value] = head match {
    case "SELECT" | "WITH" | "VALUES" | "TABLE" | "EXPLAIN" | "DESCRIBE" => Some(Select)
    case "INSERT" => Some(Insert)
    case "UPDATE" => Some(Update)
    case "DELETE" => Some(Delete)
    case "CREATE" => Some(Create)
    case "DROP" => Some(Drop)
    case "ALTER" => Some(Alter)
    case "TRUNCATE" => Some(Truncate)
    case _ => None
  }
}

final class AuthManager {
  import Permission._

  final case class User(name: String, var password: Option[String],
      var superuser: Boolean, roles: mutable.Set[String])
  final case class Role(name: String,
      /** table name (lowercase) or "*" → permissions */
      grants: mutable.Map[String, mutable.Set[Permission.Value]],
      parents: mutable.Set[String])

  private val users = mutable.Map.empty[String, User]
  private val roles = mutable.Map.empty[String, Role]

  // predefined principals (reference: auth.rs predefined roles)
  createUser("postgres", None, superuser = true)
  createRole("readonly")
  grant("readonly", "*", Select)
  createRole("readwrite")
  Seq(Select, Insert, Update, Delete).foreach(grant("readwrite", "*", _))
  createRole("dbadmin")
  Permission.values.foreach(grant("dbadmin", "*", _))

  def createUser(name: String, password: Option[String],
      superuser: Boolean = false): Unit = synchronized {
    users(name) = User(name, password, superuser, mutable.Set.empty)
  }

  def dropUser(name: String): Boolean = synchronized { users.remove(name).isDefined }

  def createRole(name: String): Unit = synchronized {
    roles.getOrElseUpdate(name, Role(name, mutable.Map.empty, mutable.Set.empty))
  }

  def dropRole(name: String): Boolean = synchronized { roles.remove(name).isDefined }

  def userExists(name: String): Boolean = synchronized(users.contains(name))
  def roleExists(name: String): Boolean = synchronized(roles.contains(name))
  def password(user: String): Option[String] = synchronized(users.get(user).flatMap(_.password))

  /** GRANT role TO user (or role-to-role inheritance). */
  def grantRole(role: String, to: String): Unit = synchronized {
    if (!roles.contains(role)) throw PgException("42704", s"""role "$role" does not exist""")
    users.get(to) match {
      case Some(u) => u.roles += role
      case None =>
        val r = roles.getOrElse(to, throw PgException("42704", s"""role "$to" does not exist"""))
        r.parents += role
    }
  }

  def revokeRole(role: String, from: String): Unit = synchronized {
    users.get(from).foreach(_.roles -= role)
    roles.get(from).foreach(_.parents -= role)
  }

  /** GRANT permission ON table TO role. Table "*" = all tables. */
  def grant(role: String, table: String, perm: Permission.Value): Unit = synchronized {
    val r = roles.getOrElse(role, throw PgException("42704", s"""role "$role" does not exist"""))
    r.grants.getOrElseUpdate(table.toLowerCase, mutable.Set.empty) += perm
  }

  def revoke(role: String, table: String, perm: Permission.Value): Unit = synchronized {
    roles.get(role).foreach(_.grants.get(table.toLowerCase).foreach(_ -= perm))
  }

  /** All roles a user holds, following inheritance recursively
    * (reference: auth.rs role-inheritance resolution).
    */
  private def effectiveRoles(start: Iterable[String]): Set[String] = {
    val seen = mutable.Set.empty[String]
    def walk(r: String): Unit =
      if (seen.add(r)) roles.get(r).foreach(_.parents.foreach(walk))
    start.foreach(walk)
    seen.toSet
  }

  /** Does `user` hold `perm` on `table`? Superusers always pass;
    * unknown users always fail.
    */
  def check(user: String, perm: Permission.Value, table: String): Boolean = synchronized {
    users.get(user) match {
      case None => false
      case Some(u) if u.superuser => true
      case Some(u) =>
        val t = table.toLowerCase
        effectiveRoles(u.roles).exists { rn =>
          roles.get(rn).exists { r =>
            r.grants.get("*").exists(_.contains(perm)) ||
              r.grants.get(t).exists(_.contains(perm))
          }
        }
    }
  }

  /** Statement-level gate used by the permissions hook: required
    * permission for the statement head on every referenced table (or
    * the wildcard scope when no tables are extractable).
    */
  def checkStatement(user: String, head: String, tables: Seq[String]): Unit =
    Permission.forStatement(head).foreach { perm =>
      val scopes = if (tables.isEmpty) Seq("*") else tables
      scopes.foreach { t =>
        if (!check(user, perm, t) && !check(user, perm, "*"))
          throw PgException("42501",
            s"permission denied for ${perm.toString.toLowerCase} on $t (user $user)")
      }
    }
}

/** User-pluggable query interception (reference: hooks/mod.rs:22-77):
  * first hook returning Some short-circuits the normal path.
  */
trait QueryHook {
  def handle(spark: org.apache.spark.sql.SparkSession, session: Session,
      sql: String): Option[PgResult]
}
