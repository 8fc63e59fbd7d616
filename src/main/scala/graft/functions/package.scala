package graft

/** Re-export of the Catalyst-hosted native expressions under the
  * library's own namespace. */
package object functions {
  val native: org.apache.spark.sql.graft.native.type = org.apache.spark.sql.graft.native
}
