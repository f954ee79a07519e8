package org.apache.spark.sql.graft

import org.apache.spark.sql.types.AbstractDataType

/** [[org.apache.spark.sql.types.AbstractDataType]] is `private[sql]`,
  * but `ExpectsInputTypes.inputTypes` — the analysis-time input
  * contract every SQL-registered expression should declare — is typed
  * against it. Same bridge rationale as [[ColumnBridge]]: a public
  * alias minted inside the sql package so graft expressions can
  * override the member.
  */
object TypeBridge {
  type AbstractType = AbstractDataType
}
