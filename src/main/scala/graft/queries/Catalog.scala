package graft.queries

/** The full declared query surface: every QueryDef the driver verifies.
  * New query families register here so SparkEntry picks them up. */
object Catalog {
  def all: Seq[QueryDef] =
    CoreQueries.defs ++ ExtendedQueries.defs ++ ExtQueries.defs
}
