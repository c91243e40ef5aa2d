package graft.ingest

import java.nio.file.Files

import graft.SparkSpec

/** Firestore-style document-collection source (SURVEY §2.1 S3,
  * get_user_data.py:10-30): permissive schema, 12 expected fields, missing
  * fields default to null. */
class IngestSourcesSpec extends SparkSpec {

  test("users source defaults the 12 expected fields to null (S3)") {
    val dir = Files.createTempDirectory("graft-users")
    Files.writeString(dir.resolve("users.json"),
      """{"email": "a@x.com", "full_name": "Ada", "uid": "u1"}
        |{"email": "b@x.com", "gender": "F", "zipcd": "411045", "extra_ignored": "y"}
        |""".stripMargin)
    val df = TreeIngest.readUsers(spark, dir.toString)
    assert(df.columns.toSeq === Seq("account_Type", "addr_line", "d_Period",
      "dob", "email", "full_name", "gender", "password", "phoneNumber",
      "profile_URL", "uid", "zipcd"))
    val rows = df.orderBy("email").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("full_name") === "Ada")
    assert(rows(0).isNullAt(rows(0).fieldIndex("gender"))) // missing → null
    assert(rows(1).getAs[String]("zipcd") === "411045")
    assert(rows(1).isNullAt(rows(1).fieldIndex("password")))
  }
}
