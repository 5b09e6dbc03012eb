package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pgwire.{AuthManager, Permission, PgException}

/** AuthManager model tests mirroring the reference's
  * (datafusion-postgres/src/auth.rs:598-641): predefined roles, role
  * inheritance, per-table grants, superuser bypass.
  */
class AuthSpec extends AnyFunSuite {

  test("default postgres superuser passes every check") {
    val a = new AuthManager
    assert(a.check("postgres", Permission.Drop, "anything"))
  }

  test("unknown user fails every check") {
    val a = new AuthManager
    assert(!a.check("ghost", Permission.Select, "t"))
  }

  test("predefined readonly role grants global SELECT only") {
    val a = new AuthManager
    a.createUser("alice", Some("pw"))
    a.grantRole("readonly", "alice")
    assert(a.check("alice", Permission.Select, "region"))
    assert(!a.check("alice", Permission.Insert, "region"))
    assert(!a.check("alice", Permission.Create, "region"))
  }

  test("readwrite role grants DML but not DDL") {
    val a = new AuthManager
    a.createUser("bob", None)
    a.grantRole("readwrite", "bob")
    assert(a.check("bob", Permission.Insert, "t"))
    assert(a.check("bob", Permission.Delete, "t"))
    assert(!a.check("bob", Permission.Drop, "t"))
  }

  test("per-table grant scopes to that table") {
    val a = new AuthManager
    a.createUser("carol", None)
    a.createRole("sales_reader")
    a.grant("sales_reader", "orders", Permission.Select)
    a.grantRole("sales_reader", "carol")
    assert(a.check("carol", Permission.Select, "orders"))
    assert(!a.check("carol", Permission.Select, "lineitem"))
  }

  test("role inheritance resolves recursively") {
    val a = new AuthManager
    a.createRole("base"); a.grant("base", "t", Permission.Select)
    a.createRole("mid"); a.grantRole("base", "mid")
    a.createRole("top"); a.grantRole("mid", "top")
    a.createUser("dave", None)
    a.grantRole("top", "dave")
    assert(a.check("dave", Permission.Select, "t"))
    a.revokeRole("mid", "top")
    assert(!a.check("dave", Permission.Select, "t"))
  }

  test("granting an unknown role raises 42704") {
    val a = new AuthManager
    a.createUser("eve", None)
    val e = intercept[PgException](a.grantRole("nope", "eve"))
    assert(e.code === "42704")
  }

  test("checkStatement gates by statement head and table scope") {
    val a = new AuthManager
    a.createUser("frank", None)
    a.grantRole("readonly", "frank")
    a.checkStatement("frank", "SELECT", Seq("region")) // no throw
    val e = intercept[PgException](
      a.checkStatement("frank", "DROP", Seq("region")))
    assert(e.code === "42501")
  }
}
