package graft

import org.apache.spark.sql.{Column, ColumnName}
import org.apache.spark.sql.functions.col

/** Symbol expression DSL — the last §2.1 API-parity row: the reference's
  * `dsl/package.scala:36-62` lets users write `'a + 'b`, `'a === 'b`,
  * `'a <= 3` and pass symbols wherever attributes go. Importing
  * `graft.dsl._` provides the same surface over Spark `Column`s.
  *
  * Design: ONE implicit view `Symbol => SymbolColumn <: ColumnName`, so
  * symbols go anywhere a Column goes (`df.select('a, 'b)`), and the
  * operator overrides unwrap a Symbol right-hand side into a column
  * reference (`'a === 'b` compares columns instead of failing on a Symbol
  * literal). Being a `ColumnName` subtype also makes this view strictly
  * more specific than `spark.implicits.symbolToColumn`, so both imports
  * coexist without ambiguity.
  */
package object dsl {

  implicit def symbolToColumn(s: Symbol): SymbolColumn = new SymbolColumn(s.name)

  final class SymbolColumn(name: String) extends ColumnName(name) {
    /** symbols on the right-hand side become columns, not literals. */
    private def v(o: Any): Any = o match {
      case sym: Symbol => col(sym.name)
      case x           => x
    }

    // arithmetic (reference arithmetic.scala ops)
    override def +(other: Any): Column = super.+(v(other))
    override def -(other: Any): Column = super.-(v(other))
    override def *(other: Any): Column = super.*(v(other))
    override def /(other: Any): Column = super./(v(other))
    override def %(other: Any): Column = super.%(v(other))

    // comparisons / boolean (reference predicates.scala ops)
    override def ===(other: Any): Column = super.===(v(other))
    override def =!=(other: Any): Column = super.=!=(v(other))
    override def <(other: Any): Column = super.<(v(other))
    override def <=(other: Any): Column = super.<=(v(other))
    override def >(other: Any): Column = super.>(v(other))
    override def >=(other: Any): Column = super.>=(v(other))
    override def &&(other: Any): Column = super.&&(v(other))
    override def ||(other: Any): Column = super.||(v(other))
  }
}
